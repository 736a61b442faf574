"""Pure vectorized kernels. Every kernel that feeds a correctness gate has a
DuckDB-SQL twin generated from the same constants (single source of truth), so
the Ray pipeline and the SQL oracle are bit-identical on float64."""
