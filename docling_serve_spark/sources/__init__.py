from docling_serve_spark.sources.pages import (  # noqa: F401
    PAGES_SCHEMA,
    build_pages_df,
    gen_page,
    write_pages_parquet,
)
