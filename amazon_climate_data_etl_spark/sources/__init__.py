"""Ingest boundaries and sinks.

Spark has no NetCDF or Shapefile connector (SURVEY.md §2.1 S1/S2); the
engine's design decision is an *ingest boundary*: one-time relationalization
jobs produce partitioned Parquet, and every query runs against that. The
modules here implement the boundary patterns plus the CSV sinks the
reference writes (S3–S5).
"""
