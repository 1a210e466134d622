"""Document model: a deterministic, DoclingDocument-shaped tree.

Mirrors the *shape* of docling-core's DoclingDocument as used by the
reference server (asserted in
reference:tests/test_1-file-all-outputs.py:88-91 — ``"schema_name":
"DoclingDocument"`` — and described in SURVEY.md §1.1): item arrays
with per-item provenance ``{page_no, bbox{l,t,r,b}, charspan[2]}``.
Built from scratch as plain dataclasses (no pydantic, no docling
import); every field is deterministic so exports are byte-stable.
"""

from __future__ import annotations

from dataclasses import dataclass, field


SCHEMA_NAME = "DoclingDocument"
SCHEMA_VERSION = "1.0.0"

# Item types (subset of docling-core labels relevant to HTML/PDF
# extraction; reference export channels at
# reference:docling_serve/response_preparation.py:74-111).
TITLE = "title"
SECTION_HEADER = "section_header"
TEXT = "text"
LIST_ITEM = "list_item"
TABLE = "table"
CODE = "code"
PAGE_HEADER = "page_header"
PAGE_FOOTER = "page_footer"
CAPTION = "caption"
PICTURE = "picture"


@dataclass(frozen=True)
class BBox:
    """Bounding box in page coordinates, origin top-left, y down."""

    l: float = 0.0
    t: float = 0.0
    r: float = 0.0
    b: float = 0.0

    def as_dict(self) -> dict:
        return {"l": self.l, "t": self.t, "r": self.r, "b": self.b}


@dataclass(frozen=True)
class Prov:
    """Provenance of one item: page + bbox + charspan into the
    document's strict-text channel (start inclusive, end exclusive)."""

    page_no: int = 1
    bbox: BBox = field(default_factory=BBox)
    charspan: tuple[int, int] = (0, 0)

    def as_dict(self) -> dict:
        return {
            "page_no": self.page_no,
            "bbox": self.bbox.as_dict(),
            "charspan": list(self.charspan),
        }


@dataclass(frozen=True)
class TableCell:
    text: str
    row_span: int = 1
    col_span: int = 1
    is_header: bool = False


@dataclass
class TableData:
    num_rows: int
    num_cols: int
    grid: list[list[TableCell]]  # normalized rectangular grid


@dataclass
class DocItem:
    item_type: str
    text: str  # for pictures: the alt text
    level: int = 0  # heading level for section_header (1..6)
    prov: list[Prov] = field(default_factory=list)
    table: TableData | None = None
    image_ref: str = ""  # for pictures: the source URI


@dataclass
class Document:
    """One converted document (reference DocumentResponse row,
    reference:docling_serve/datamodel/responses.py:22-28)."""

    name: str
    items: list[DocItem] = field(default_factory=list)
    num_pages: int = 1
    origin_mimetype: str = "text/html"

    def texts(self) -> list[DocItem]:
        return [i for i in self.items if i.item_type != TABLE]

    def tables(self) -> list[DocItem]:
        return [i for i in self.items if i.item_type == TABLE]


def table_to_rows(table: TableData) -> list[list[str]]:
    """Rectangular text grid with spans expanded (deterministic)."""
    rows: list[list[str]] = []
    for r in range(table.num_rows):
        row: list[str] = []
        for c in range(table.num_cols):
            if r < len(table.grid) and c < len(table.grid[r]):
                row.append(table.grid[r][c].text)
            else:
                row.append("")
        rows.append(row)
    return rows
