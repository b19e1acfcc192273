"""Sources (reference S1-S6): fixture JSON, CSV, and the paginated
Facebook-insights DataSource with predicate/column pushdown."""
