"""Dataset sources: parquet readers and the deterministic synthetic
Common-Crawl-style page generator (bench / scale testing)."""
