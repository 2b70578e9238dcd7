"""Minimal stdlib .xlsx codec (zipfile + xml.etree) — no openpyxl.

An .xlsx file is a zip of XML parts (ECMA-376 / ISO 29500
SpreadsheetML, public spec). This module implements the flat-table
subset the reference actually uses — one sheet, a header row, scalar
cells (reference: utils.py:60-163 styled export, app.py:2064-2120
upload ingestion) — so Excel ingestion/export works in THIS image,
where openpyxl is absent. The openpyxl paths in readers/writers remain
the preferred route when the library exists (styles, multi-sheet).

Write: inline strings (``t="inlineStr"``), numbers as ``<v>``,
booleans as ``t="b"`` — no sharedStrings table needed. Read: supports
shared strings, inline strings, formula-cached strings, booleans and
numbers; blank cells land as None.

Scale note: Excel is a driver-side, small-output format by NATURE
(the format caps at 1,048,576 rows); these helpers are deliberately
driver-local, and the Spark-facing wrappers cap/collect accordingly.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""

# Header style 1 mirrors the reference's export treatment
# (utils.py:88-92): bold white text, solid #366092 fill, centered.
# Fills 0/1 are the spec-mandated none/gray125 placeholders.
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="2"><font/><font><b/><color rgb="FFFFFFFF"/></font></fonts>
<fills count="3"><fill><patternFill patternType="none"/></fill>
<fill><patternFill patternType="gray125"/></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FF366092"/></patternFill></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="2"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>
<xf numFmtId="0" fontId="1" fillId="2" borderId="0" applyFont="1" applyFill="1" applyAlignment="1"><alignment horizontal="center"/></xf></cellXfs>
</styleSheet>"""


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    """A1-style cell ref -> 0-based column index."""
    out = 0
    for ch in ref:
        if not ch.isalpha():
            break
        out = out * 26 + (ord(ch.upper()) - ord("A") + 1)
    return out - 1


def _cell_xml(ref: str, value, style: int | None = None) -> str:
    s = f' s="{style}"' if style else ""
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}"{s} t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (value != value):   # NaN: blank
            return ""
        return f'<c r="{ref}"{s}><v>{value!r}</v></c>'
    text = escape(str(value))
    # literal control chars are invalid XML; strip like Excel does
    text = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", text)
    space = ' xml:space="preserve"' if text != text.strip() else ""
    return (f'<c r="{ref}"{s} t="inlineStr"><is>'
            f'<t{space}>{text}</t></is></c>')


def _col_widths_xml(header: list[str], rows: list[list]) -> str:
    """<cols> width autofit, the reference's rule (utils.py:93-105):
    width = min(longest cell string + 2, 50) per column."""
    out = []
    for c_idx, name in enumerate(header):
        longest = len(str(name))
        for row in rows:
            if c_idx < len(row) and row[c_idx] is not None:
                longest = max(longest, len(str(row[c_idx])))
        w = min(longest + 2, 50)
        out.append(f'<col min="{c_idx + 1}" max="{c_idx + 1}" '
                   f'width="{w}" customWidth="1"/>')
    return "<cols>" + "".join(out) + "</cols>" if out else ""


def write_xlsx(path: str, header: list[str], rows: list[list],
               sheet_name: str = "Export", styled: bool = False) -> None:
    """Write a flat table as a single-sheet .xlsx (stdlib only). With
    ``styled``, the header row gets the reference's export treatment
    (bold white on #366092, centered — utils.py:88-92) and columns get
    autofit widths (utils.py:93-105) — legal plain SpreadsheetML, no
    openpyxl."""
    lines = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main">']
    if styled:
        lines.append(_col_widths_xml(list(header), rows))
    lines.append("<sheetData>")
    all_rows = [list(header)] + [list(r) for r in rows]
    for r_idx, row in enumerate(all_rows, start=1):
        style = 1 if (styled and r_idx == 1) else None
        cells = "".join(
            _cell_xml(f"{_col_letter(c_idx)}{r_idx}", v, style)
            for c_idx, v in enumerate(row))
        lines.append(f'<row r="{r_idx}">{cells}</row>')
    lines.append("</sheetData></worksheet>")
    sheet = "\n".join(lines)
    safe_name = escape(sheet_name)[:31] or "Export"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK.format(name=safe_name))
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/styles.xml", _STYLES)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _sheet_part(z: zipfile.ZipFile, sheet: str | int) -> str:
    """Resolve a sheet name/index to its zip part via the workbook
    relationships (sheet order in workbook.xml is the user-visible
    order; rIds need not be sequential)."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    targets = {r.get("Id"): r.get("Target")
               for r in rels.findall(f"{rel_ns}Relationship")}
    sheets = wb.findall(f"{_NS}sheets/{_NS}sheet")
    if not sheets:
        raise ValueError("workbook has no sheets")
    if isinstance(sheet, int):
        if not 0 <= sheet < len(sheets):
            raise ValueError(f"sheet index {sheet} out of range")
        node = sheets[sheet]
    else:
        by_name = {s.get("name"): s for s in sheets}
        if sheet not in by_name:
            raise ValueError(f"no sheet named {sheet!r}; "
                             f"have {sorted(by_name)}")
        node = by_name[sheet]
    target = targets[node.get(f"{_REL_NS}id")]
    return target if target.startswith("xl/") else f"xl/{target}"


def read_xlsx(path: str, sheet: str | int = 0
              ) -> tuple[list[str], list[list]]:
    """Read one sheet of an .xlsx as (header, rows) — stdlib only.
    First row is the header; ragged rows are padded with None."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_NS}t")))
        sheet_root = ET.fromstring(z.read(_sheet_part(z, sheet)))
        raw_rows: list[dict[int, object]] = []
        for row in sheet_root.iter(f"{_NS}row"):
            cells: dict[int, object] = {}
            for pos, c in enumerate(row.findall(f"{_NS}c")):
                ref = c.get("r")
                idx = _col_index(ref) if ref else pos
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    cells[idx] = "".join(t.text or ""
                                         for t in c.iter(f"{_NS}t"))
                    continue
                v = c.find(f"{_NS}v")
                if v is None or v.text is None:
                    cells[idx] = None
                elif ctype == "s":
                    cells[idx] = shared[int(v.text)]
                elif ctype == "str":
                    cells[idx] = v.text
                elif ctype == "b":
                    cells[idx] = v.text in ("1", "true")
                else:
                    # match openpyxl inference (int when the stored
                    # text has no '.'/exponent) so the Spark schema is
                    # the same whichever reader ingested the file
                    t = v.text.strip()
                    cells[idx] = (int(t) if re.fullmatch(r"-?\d+", t)
                                  else float(t))
            raw_rows.append(cells)
    if not raw_rows:
        return [], []
    width = max((max(r) + 1) for r in raw_rows if r) if any(raw_rows) else 0
    table = [[r.get(i) for i in range(width)] for r in raw_rows]
    header = [("" if h is None else str(h)) for h in table[0]]
    return header, table[1:]
