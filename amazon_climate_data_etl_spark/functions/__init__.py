"""Column-expression libraries: pure ``pyspark.sql.functions`` compositions.

Everything here returns ``Column`` objects, so Catalyst can constant-fold,
push down, and codegen through them — no Python UDFs (SURVEY.md §2.8: the
reference's only scalar UDF, VPD, is a closed-form numpy expression that
lowers to native Column arithmetic).
"""

from amazon_climate_data_etl_spark.functions.climate import vpd_column, saturation_vapor_pressure
from amazon_climate_data_etl_spark.functions.text import (
    token_count,
    tokens,
    quality_score,
    lang_guess,
    doc_fingerprint,
)
from amazon_climate_data_etl_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "vpd_column",
    "saturation_vapor_pressure",
    "token_count",
    "tokens",
    "quality_score",
    "lang_guess",
    "doc_fingerprint",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
