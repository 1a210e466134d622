from docling_serve_spark.extract.html_extract import extract_html  # noqa: F401
from docling_serve_spark.extract.core import (  # noqa: F401
    ExtractionResult,
    extract_document,
    sniff_doc_type,
)
