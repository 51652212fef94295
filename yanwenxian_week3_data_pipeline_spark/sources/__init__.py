"""Sources: parquet star-schema tables and the article-JSON envelope reader."""
