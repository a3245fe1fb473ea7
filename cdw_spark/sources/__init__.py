"""Source connectors: bulk JSON (the reference's COPY paths) and Parquet."""
