"""Dependency-free ``.docx`` concordance export.

Reference: common/.../lucene/snippets/DocxResults.java:1-201 (+ the
office/Docx writer it fills): each concordance line becomes a paragraph
with a BOLD pivot; every document opens with a Heading2 paragraph; the
citation becomes a footnote whose reference mark closes the line. The
reference fills a ``template.docx``; here the package is assembled from
literal WordprocessingML parts over :mod:`zipfile` — no template, no
third-party docx library, byte-deterministic output (fixed zip
timestamps) so exports are cacheable and testable by hash.
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>
<Override PartName="/word/footnotes.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.footnotes+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""

_DOC_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/footnotes" Target="footnotes.xml"/>
</Relationships>"""

_STYLES = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:styles xmlns:w="{_W}">
<w:style w:type="paragraph" w:styleId="Heading2">
<w:name w:val="heading 2"/>
<w:rPr><w:b/><w:sz w:val="26"/></w:rPr>
</w:style>
<w:style w:type="character" w:styleId="FootnoteReference">
<w:name w:val="footnote reference"/>
<w:rPr><w:vertAlign w:val="superscript"/></w:rPr>
</w:style>
</w:styles>"""


def run(text: str, italic: bool = False, bold: bool = False) -> str:
    """One ``<w:r>`` text run (Docx.run in the reference's writer)."""
    props = ""
    if bold or italic:
        props = (
            "<w:rPr>"
            + ("<w:b/>" if bold else "")
            + ("<w:i/>" if italic else "")
            + "</w:rPr>"
        )
    return f'<w:r>{props}<w:t xml:space="preserve">{escape(text)}</w:t></w:r>'


def _footnote_ref(note_id: int) -> str:
    return (
        '<w:r><w:rPr><w:rStyle w:val="FootnoteReference"/></w:rPr>'
        f'<w:footnoteReference w:id="{note_id}"/></w:r>'
    )


def build_docx(body_xml: str, footnotes: list[str]) -> bytes:
    """Assemble a valid minimal package from body paragraphs XML and
    footnote run-XML strings (ids are assigned 2.. in list order; ids
    0/1 are the separator notes Word requires)."""
    notes = [
        '<w:footnote w:type="separator" w:id="0"><w:p><w:r><w:separator/>'
        "</w:r></w:p></w:footnote>",
        '<w:footnote w:type="continuationSeparator" w:id="1"><w:p><w:r>'
        "<w:continuationSeparator/></w:r></w:p></w:footnote>",
    ]
    for i, runs_xml in enumerate(footnotes):
        notes.append(f'<w:footnote w:id="{i + 2}"><w:p>{runs_xml}</w:p></w:footnote>')
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>{body_xml}</w:body></w:document>'
    )
    footnotes_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:footnotes xmlns:w="{_W}">{"".join(notes)}</w:footnotes>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _ROOT_RELS),
            ("word/_rels/document.xml.rels", _DOC_RELS),
            ("word/styles.xml", _STYLES),
            ("word/document.xml", document),
            ("word/footnotes.xml", footnotes_xml),
        ):
            # fixed timestamp: byte-deterministic package
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return buf.getvalue()


def concordance_docx(rows: list[dict], url_template: str = "") -> bytes:
    """KWIC rows → docx bytes (DocxResults.docOpen/snippet semantics).

    ``rows``: dicts with doc_id, pos, left_ctx, pivot, right_ctx —
    the server's conc op output, in (doc_id, pos) order. A Heading2
    paragraph opens each new doc_id; each line is
    ``left PIVOT right`` with the pivot bold and a footnote carrying
    the citation (doc id + position, plus the expanded url template,
    DocxResults.docUrl)."""
    body: list[str] = []
    footnotes: list[str] = []
    last_doc = None
    for r in rows:
        doc_id = r.get("doc_id")
        if doc_id != last_doc:
            body.append(
                '<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr>'
                + run(f"doc {doc_id}", bold=True)
                + "</w:p>"
            )
            last_doc = doc_id
        runs = []
        left = str(r.get("left_ctx") or "")
        right = str(r.get("right_ctx") or "")
        if left:
            runs.append(run(left + " "))
        runs.append(run(str(r.get("pivot") or ""), bold=True))
        if right:
            runs.append(run(" " + right))
        citation = run(f"doc {doc_id}, position {r.get('pos')}", italic=True)
        if url_template:
            url = url_template.replace("{docid}", str(doc_id))
            citation += run(" " + url)
        footnotes.append(citation)
        runs.append(_footnote_ref(len(footnotes) + 1))  # ids start at 2
        body.append("<w:p>" + "".join(runs) + "</w:p>")
    return build_docx("".join(body), footnotes)
