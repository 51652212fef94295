"""Row-set operators: filters, dedup family, validation, aggregates,
similarity search, sessionization."""
