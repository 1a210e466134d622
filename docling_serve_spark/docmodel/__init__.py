from docling_serve_spark.docmodel.model import (  # noqa: F401
    BBox,
    DocItem,
    Document,
    Prov,
    TableCell,
    TableData,
)
from docling_serve_spark.docmodel.export import (  # noqa: F401
    export_to_doctags,
    export_to_html,
    export_to_json,
    export_to_markdown,
    export_to_text,
)
