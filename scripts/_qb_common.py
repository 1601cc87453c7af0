"""Shared helpers for the quality-benchmark scripts.

The tracking file (QUALITY.md) holds several task tables (binary / instance /
blob). Naively appending a row at file end files it under whatever table
happens to be last — two round-4 rows landed under the blob table this way.
``insert_table_row`` anchors on the table's own header line (the column sets
are distinct per task) and inserts the row after that table's last row.
"""

from __future__ import annotations

from pathlib import Path


def insert_table_row(qfile: Path, table_header: str, section_block: str, row: str) -> None:
    """Insert ``row`` at the end of the markdown table whose header line is
    ``table_header`` in ``qfile``. Creates the file/section (``section_block``,
    which must include the table header lines) when absent.

    The table's span runs from its header line to the next markdown heading
    ('#'-prefixed line) or EOF; the row goes after the last '|' line in that
    span, so interleaved prose notes (e.g. the blend-fix blockquote) don't
    truncate it.
    """
    if not row.endswith("\n"):
        row += "\n"
    text = qfile.read_text() if qfile.exists() else ""
    lines = text.splitlines(keepends=True)
    anchor = None
    for i, ln in enumerate(lines):
        if ln.strip() == table_header.strip():
            anchor = i
            break
    if anchor is None:
        if text and not text.endswith("\n"):
            text += "\n"
        if not section_block.endswith("\n"):
            section_block += "\n"
        qfile.write_text(text + section_block + row)
        return
    end = len(lines)
    for j in range(anchor + 1, len(lines)):
        if lines[j].startswith("#"):
            end = j
            break
    last_row = anchor
    for j in range(anchor + 1, end):
        if lines[j].lstrip().startswith("|"):
            last_row = j
    lines.insert(last_row + 1, row)
    qfile.write_text("".join(lines))
