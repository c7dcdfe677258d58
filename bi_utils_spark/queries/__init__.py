"""Per-domain oracle-query registry modules (r10 verdict task 8).

Importing this package in module order reproduces the exact
registration order the single-file registry had; the facade
(bi_utils_spark.entry_queries) then applies the _PROMOTED window
and assembles RAW_QUERIES."""

