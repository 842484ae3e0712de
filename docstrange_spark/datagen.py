"""Deterministic span-table generation (FIXTURES.md §2-3).

Two corpora, both pure functions of their arguments — identical across
runs and across parallelism levels (each document's content depends only
on its doc index and the seed, never on partitioning):

- ``fixture_docs()``: the handcrafted golden corpus F1-F16 mirroring the
  reference's test fixtures (/root/reference/tests/test_json_structure.py,
  test_html_generation.py, test_real_files.py);
- ``scale_spans(spark, n_docs)``: the SF-scaled corpus for correctness-at-
  scale and bench — templates with seeded lexical variation, built
  distributed via mapInPandas over ``spark.range`` (no driver-side data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42

# bump whenever generation logic changes — bench caches generated
# corpora under /tmp keyed by this token
DATAGEN_VERSION = "v1"

# Deterministic vocabulary in the spirit of the driver's documents.text
# word pool (TESTDATA.md) — a fixed literal so generation needs no input
# files.
VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "spark group query row data slow filter customer line batch value "
    "stream page index shuffle broadcast skew salt span text media block "
    "heading list code quote image link cell grid layout column density "
    "markdown section token chunk search title level report metric growth"
).split()

SPAN_SCHEMA_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def sp(kind: str, text: str = "", media_ref: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _seq(spans: list[dict]) -> list[dict]:
    """Assign sequential offsets (used where order is simply positional)."""
    return [dict(s, offset=i) for i, s in enumerate(spans)]


def _words(rng: np.random.Generator, n: int) -> str:
    return " ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), n))


# ---------------------------------------------------------------------------
# fixture corpus (F1-F16) — handcrafted, golden-checked


def _f1_md_structure() -> list[dict]:
    return _seq(
        [
            sp("heading", "Main Title", "h1"),
            sp("text", "This is the introduction paragraph."),
            sp("heading", "Section 1", "h2"),
            sp("text", "Content of section one."),
            sp("heading", "Subsection 1.1", "h3"),
            sp("text", "Subsection content here."),
            sp("heading", "Section 2", "h2"),
            sp("text", "Content of section two."),
        ]
    )


def _f2_content_types() -> list[dict]:
    return _seq(
        [
            sp("heading", "Content Types", "h1"),
            sp("text", "A paragraph with **bold** and *italic* text."),
            sp("list_item", "First item", "ul:0"),
            sp("list_item", "Nested item", "ul:1"),
            sp("list_item", "Second item", "ul:0"),
            sp("list_item", "Step one", "ol:0:1"),
            sp("list_item", "Step two", "ol:0:2"),
            sp("code", "def hello():", "python"),
            sp("code", "    return 'world'", "python"),
            sp("code", "console.log('hi');", "javascript"),
            sp("table_cell", "Name", "r0:c0:t0"),
            sp("table_cell", "Value", "r0:c1:t0"),
            sp("table_cell", "alpha", "r1:c0:t0"),
            sp("table_cell", "1", "r1:c1:t0"),
            sp("table_cell", "beta", "r2:c0:t0"),
            sp("table_cell", "2", "r2:c1:t0"),
            sp("link", "Example", "https://example.com"),
            sp("image", "Diagram", "https://example.com/d.png"),
            sp("blockquote", "A famous quote line one."),
            sp("blockquote", "And its second line."),
        ]
    )


def _f3_no_headers() -> list[dict]:
    return _seq(
        [
            sp("text", "Just some plain text content."),
            sp("text", "Another paragraph without any headers."),
            sp("list_item", "A list item", "ul:0"),
        ]
    )


def _f4_empty_doc() -> list[dict]:
    return []


def _f5_deep_hierarchy() -> list[dict]:
    return _seq(
        [
            sp("heading", "Level 1", "h1"),
            sp("text", "Top content."),
            sp("heading", "Level 2", "h2"),
            sp("text", "Second content."),
            sp("heading", "Level 3", "h3"),
            sp("text", "Third content."),
            sp("heading", "Level 4", "h4"),
            sp("text", "Fourth content."),
            sp("heading", "Another Level 3", "h3"),
            sp("text", "More third content."),
            sp("heading", "Another Level 2", "h2"),
            sp("text", "More second content."),
            sp("heading", "Second Top", "h1"),
            sp("text", "Second top content."),
        ]
    )


def _f6_html_features() -> list[dict]:
    return _seq(
        [
            sp("heading", "HTML Feature Test", "h1"),
            sp(
                "text",
                "Mix of ***bold italic***, **bold**, *italic*, ~~strike~~ and `code`.",
            ),
            sp("code", "fenced = True", "python"),
            sp("table_cell", "Feature", "r0:c0:t0"),
            sp("table_cell", "Status", "r0:c1:t0"),
            sp("table_cell", "**bold cell**", "r1:c0:t0"),
            sp("table_cell", "ok", "r1:c1:t0"),
            sp("link", "A link", "https://example.org"),
            sp("image", "An image", "https://example.org/i.png"),
            sp("blockquote", "Quoted wisdom."),
            sp("text", "---"),
            sp("list_item", "Outer", "ul:0"),
            sp("list_item", "Inner", "ul:1"),
        ]
    )


def _f7_business_report() -> list[dict]:
    return _seq(
        [
            sp("heading", "Quarterly Business Report", "h1"),
            sp("text", "Executive summary of company performance."),
            sp("heading", "Key Metrics", "h2"),
            sp("list_item", "Revenue up 12%", "ul:0"),
            sp("list_item", "Churn down 3%", "ul:0"),
            sp("table_cell", "Metric", "r0:c0:t0"),
            sp("table_cell", "Q3", "r0:c1:t0"),
            sp("table_cell", "Q4", "r0:c2:t0"),
            sp("table_cell", "Growth", "r0:c3:t0"),
            sp("table_cell", "Revenue", "r1:c0:t0"),
            sp("table_cell", "1.2M", "r1:c1:t0"),
            sp("table_cell", "1.4M", "r1:c2:t0"),
            sp("table_cell", "17%", "r1:c3:t0"),
            sp("table_cell", "Users", "r2:c0:t0"),
            sp("table_cell", "40k", "r2:c1:t0"),
            sp("table_cell", "52k", "r2:c2:t0"),
            sp("table_cell", "30%", "r2:c3:t0"),
            sp("table_cell", "NPS", "r3:c0:t0"),
            sp("table_cell", "41", "r3:c1:t0"),
            sp("table_cell", "47", "r3:c2:t0"),
            sp("table_cell", "15%", "r3:c3:t0"),
            sp("heading", "Recommendations", "h2"),
            sp("list_item", "Expand sales team", "ol:0:1"),
            sp("list_item", "Invest in onboarding", "ol:0:2"),
        ]
    )


def _f8_html_page() -> list[dict]:
    return _seq(
        [
            sp("tag_open", "html"),
            sp("tag_open", "head"),
            sp("tag_open", "title"),
            sp("text", "Welcome Page"),
            sp("tag_close", "title"),
            sp("tag_open", "script"),
            sp("script", "var x = 1;"),
            sp("tag_close", "script"),
            sp("tag_open", "style"),
            sp("style", "body { color: red }"),
            sp("tag_close", "style"),
            sp("tag_close", "head"),
            sp("tag_open", "body"),
            sp("tag_open", "nav"),
            sp("text", "Home"),
            sp("link", "About", "/about"),
            sp("tag_close", "nav"),
            sp("tag_open", "main"),
            sp("text", "The   main    article text."),
            sp("text", "A second content paragraph."),
            sp("link", "Read more", "https://example.com/more"),
            sp("tag_close", "main"),
            sp("tag_open", "footer"),
            sp("text", "Copyright notice"),
            sp("tag_close", "footer"),
            sp("tag_close", "body"),
            sp("tag_close", "html"),
        ]
    )


def _f9_csv_sheet() -> list[dict]:
    return _seq(
        [
            sp("heading", "CSV Data: people", "h1"),
            sp("table_cell", "Name", "r0:c0:t0"),
            sp("table_cell", "Age", "r0:c1:t0"),
            sp("table_cell", "City", "r0:c2:t0"),
            sp("table_cell", "Alice", "r1:c0:t0"),
            sp("table_cell", "30", "r1:c1:t0"),
            sp("table_cell", "Paris", "r1:c2:t0"),
            sp("table_cell", "Bob", "r2:c0:t0"),
            sp("table_cell", "25", "r2:c1:t0"),
            sp("table_cell", "Rome", "r2:c2:t0"),
            sp("table_cell", "Cara", "r3:c0:t0"),
            sp("table_cell", "41", "r3:c1:t0"),
            sp("table_cell", "Oslo", "r3:c2:t0"),
        ]
    )


def _f10_docx_like() -> list[dict]:
    spans = [
        sp("heading", "Doc Title", "h1"),
        sp("text", "Opening paragraph."),
        sp("heading", "Too Deep Heading", "h7"),  # must clamp to ######
        sp("text", "Paragraph under the deep heading."),
    ]
    # 25-row table (cap at 20 + truncation notice), one merged cell marker
    spans.append(sp("table_cell", "Col A", "r0:c0:t0:m"))
    spans.append(sp("table_cell", "Col B", "r0:c1:t0"))
    for r in range(1, 25):
        spans.append(sp("table_cell", f"a{r}", f"r{r}:c0:t0"))
        spans.append(sp("table_cell", f"b{r}", f"r{r}:c1:t0"))
    spans.append(sp("text", "Closing paragraph."))
    return _seq(spans)


def _f11_pptx_like() -> list[dict]:
    spans = []
    for n in range(1, 4):
        spans.append(sp("page_break", str(n), "slide"))
        spans.append(sp("text", f"Slide {n} headline content."))
        spans.append(sp("text", f"Slide {n} body shape text."))
    return _seq(spans)


def _f12_pdf_pages() -> list[dict]:
    # offsets encode (y,x) reading order; the 31/30 pair is deliberately
    # emitted out of order — the reading-order sort must fix it (O5)
    return [
        sp("page_break", "1", "page", 0),
        sp("text", "FIRST PAGE TITLE.", "", 2),  # caps+short -> heading
        sp("text", "Body text starts here", "", 10),
        sp("text", "and continues on the same line.", "", 11),
        sp("text", "1. first numbered finding", "", 20),
        sp("page_break", "2", "page", 25),
        sp("text", "continued paragraph on page two.", "", 31),
        sp("text", "Second page opens with", "", 30),
        sp("text", "colA\tcolB\tcolC", "", 40),
    ]


def _f13_ocr_noisy() -> list[dict]:
    return [
        sp("text", "He||o  wor|d", "", 0),
        sp("text", "with   0dd  spacing", "", 1),
        sp("text", "Date: 2024@#!", "", 10),
    ]


def _f14_classify_edge() -> list[dict]:
    # offsets spaced by 2 so every span is its own paragraph group
    cases = [
        "1. item",
        "• bullet",
        "- dash",
        "a. lettered",
        "A\tB\tC",
        "w1  w2  w3  w4",
        "SHORT CAPS.",
        "six words that are not headings",
    ]
    return [sp("text", t, "", i * 2) for i, t in enumerate(cases)]


def _f15_mega_doc() -> list[dict]:
    rng = np.random.default_rng(SEED)
    spans = []
    for i in range(2000):
        spans.append(sp("text", _words(rng, 12) + ".", "", i * 2))
    return spans


def _f16_search_nav() -> list[dict]:
    spans = []
    rng = np.random.default_rng(SEED + 16)
    for s in range(1, 9):
        spans.append(sp("heading", f"Chapter {s}", "h" + str(1 + (s % 3))))
        for p in range(4):
            marker = " needle" if (s == 3 and p == 1) or (s == 6 and p == 0) else ""
            spans.append(sp("text", _words(rng, 30) + marker + "."))
    return _seq(spans)


FIXTURES = {
    "md_structure": _f1_md_structure,
    "content_types": _f2_content_types,
    "no_headers": _f3_no_headers,
    "empty_doc": _f4_empty_doc,
    "deep_hierarchy": _f5_deep_hierarchy,
    "html_features": _f6_html_features,
    "business_report": _f7_business_report,
    "html_page": _f8_html_page,
    "csv_sheet": _f9_csv_sheet,
    "docx_like": _f10_docx_like,
    "pptx_like": _f11_pptx_like,
    "pdf_pages": _f12_pdf_pages,
    "ocr_noisy": _f13_ocr_noisy,
    "classify_edge": _f14_classify_edge,
    "mega_doc": _f15_mega_doc,
    "search_nav": _f16_search_nav,
}


def fixture_docs(include_mega: bool = False) -> list[tuple[str, list[dict]]]:
    docs = []
    for cls, build in FIXTURES.items():
        if cls == "mega_doc" and not include_mega:
            continue
        docs.append((f"{cls}-00000000", build()))
    return docs


# ---------------------------------------------------------------------------
# scale corpus — seeded lexical variation over the fixture templates


_SCALE_CLASSES = [
    # weights approximate a web corpus: markup-heavy, layout-medium
    "html_page",
    "html_page",
    "md_structure",
    "content_types",
    "business_report",
    "pdf_pages",
    "pdf_pages",
    "ocr_noisy",
    "docx_like",
    "pptx_like",
    "csv_sheet",
    "no_headers",
    "deep_hierarchy",
    "search_nav",
]


def _scale_doc(i: int, seed: int = SEED) -> tuple[str, list[dict]]:
    """One scaled document — a pure function of (i, seed)."""
    cls = _SCALE_CLASSES[i % len(_SCALE_CLASSES)]
    rng = np.random.default_rng((seed << 32) ^ i)
    doc_id = f"{cls}-{i:08d}"
    if cls == "html_page":
        n_paras = int(rng.integers(2, 8))
        spans = [
            sp("tag_open", "html"),
            sp("tag_open", "head"),
            sp("tag_open", "title"),
            sp("text", _words(rng, 4).title()),
            sp("tag_close", "title"),
            sp("tag_open", "script"),
            sp("script", "var x=" + str(int(rng.integers(0, 99))) + ";"),
            sp("tag_close", "script"),
            sp("tag_close", "head"),
            sp("tag_open", "body"),
            sp("tag_open", "nav"),
            sp("link", "Home", "/"),
            sp("link", "About", "/about"),
            sp("tag_close", "nav"),
            sp("tag_open", "div", "class=content"),
        ]
        for _ in range(n_paras):
            spans.append(sp("text", _words(rng, int(rng.integers(8, 40))) + "."))
        spans += [
            sp("tag_close", "div"),
            sp("tag_open", "footer"),
            sp("text", "footer " + _words(rng, 3)),
            sp("tag_close", "footer"),
            sp("tag_close", "body"),
            sp("tag_close", "html"),
        ]
        return doc_id, _seq(spans)
    if cls in ("pdf_pages", "ocr_noisy"):
        spans = []
        off = 0
        for page in range(1, int(rng.integers(1, 4)) + 1):
            spans.append(sp("page_break", str(page), "page", off))
            off += 5
            for _ in range(int(rng.integers(3, 10))):
                run_len = int(rng.integers(1, 4))
                for _ in range(run_len):
                    spans.append(sp("text", _words(rng, int(rng.integers(4, 12))), "", off))
                    off += 1
                off += int(rng.integers(2, 5))  # paragraph gap
        return doc_id, spans
    if cls == "docx_like":
        spans = [sp("heading", _words(rng, 3).title(), "h1")]
        for _ in range(int(rng.integers(2, 6))):
            spans.append(sp("text", _words(rng, int(rng.integers(10, 30))) + "."))
        n_rows = int(rng.integers(2, 30))
        for r in range(n_rows):
            for c in range(3):
                spans.append(sp("table_cell", _words(rng, 1), f"r{r}:c{c}:t0"))
        return doc_id, _seq(spans)
    if cls == "pptx_like":
        spans = []
        for n in range(1, int(rng.integers(2, 6)) + 1):
            spans.append(sp("page_break", str(n), "slide"))
            for _ in range(int(rng.integers(1, 4))):
                spans.append(sp("text", _words(rng, int(rng.integers(4, 15)))))
        return doc_id, _seq(spans)
    if cls == "csv_sheet":
        n_rows, n_cols = int(rng.integers(2, 12)), int(rng.integers(2, 6))
        spans = [sp("heading", "CSV Data: " + _words(rng, 1), "h1")]
        for r in range(n_rows):
            for c in range(n_cols):
                spans.append(sp("table_cell", _words(rng, 1), f"r{r}:c{c}:t0"))
        return doc_id, _seq(spans)
    # generic direct template: headings/paragraphs/lists/code/quote
    spans = [sp("heading", _words(rng, 3).title(), "h1")]
    for s in range(int(rng.integers(1, 6))):
        spans.append(sp("heading", _words(rng, 2).title(), "h2"))
        for _ in range(int(rng.integers(1, 4))):
            spans.append(sp("text", _words(rng, int(rng.integers(8, 40))) + "."))
        if rng.random() < 0.4:
            for j in range(int(rng.integers(2, 6))):
                spans.append(sp("list_item", _words(rng, 4), "ul:0"))
        if rng.random() < 0.25:
            spans.append(sp("code", _words(rng, 3) + " = 1", "python"))
        if rng.random() < 0.2:
            spans.append(sp("blockquote", _words(rng, 6)))
    return doc_id, _seq(spans)


def scale_pdf(indices: np.ndarray, seed: int = SEED, mega_every: int = 0) -> pd.DataFrame:
    """Build scaled documents for the given doc indices (pandas batch)."""
    rows = []
    for i in indices:
        i = int(i)
        if mega_every and i % mega_every == 0 and i > 0:
            rng = np.random.default_rng((seed << 32) ^ i)
            spans = [
                sp("text", _words(rng, 12) + ".", "", k * 2) for k in range(2000)
            ]
            rows.append((f"mega_doc-{i:08d}", spans))
        else:
            rows.append(_scale_doc(i, seed))
    return pd.DataFrame(rows, columns=["doc_id", "spans"])


def scale_spans(spark, n_docs: int, seed: int = SEED, mega_every: int = 0):
    """Distributed scaled span table: pure function of (n_docs, seed)."""

    def gen(batches):
        for b in batches:
            yield scale_pdf(b["id"].to_numpy(), seed=seed, mega_every=mega_every)

    return spark.range(n_docs).mapInPandas(gen, schema=SPAN_SCHEMA_DDL)


def fixture_spans(spark, include_mega: bool = False):
    """The fixture corpus as a Spark DataFrame."""
    rows = fixture_docs(include_mega=include_mega)
    pdf = pd.DataFrame(rows, columns=["doc_id", "spans"])
    return spark.createDataFrame(pdf, schema=SPAN_SCHEMA_DDL)


def synth_media(i: int) -> tuple[str, str, bytes]:
    """One deterministic media payload per id: BMP gradient / PPM bands /
    WAV sine, cycling by i % 3 — REAL encoded files (pure numpy/stdlib
    encoders from the multimodal operator), so decode paths are
    exercised on genuine format bytes."""
    from docstrange_spark.operators import multimodal as mm

    rng = np.random.default_rng((SEED << 32) ^ (0x5EED ^ i))
    if i % 3 == 0:
        h, w = 6 + i % 5, 8 + i % 7
        img = (
            np.add.outer(np.arange(h) * 9, np.arange(w) * 5)[:, :, None]
            + np.arange(3) * (i % 31)
        ).astype(np.uint8)
        return f"media-{i:06d}", "image", mm.encode_bmp(img)
    if i % 3 == 1:
        h, w = 5 + i % 4, 7 + i % 6
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        return f"media-{i:06d}", "image", mm.encode_ppm(img)
    n, rate = 400 + (i % 100), 8000
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * (200 + (i % 50) * 10) * t)
    return f"media-{i:06d}", "audio", mm.encode_wav(x.astype(np.float32), rate)


def media_table(spark, n: int = 30):
    """Deterministic media table (media_ref, kind, payload, meta)."""
    from docstrange_spark.operators.multimodal import MEDIA_SCHEMA_DDL

    rows = []
    for i in range(n):
        ref, kind, payload = synth_media(i)
        rows.append((ref, kind, bytearray(payload), {"source": "synth"}))
    pdf = pd.DataFrame(rows, columns=["media_ref", "kind", "payload", "meta"])
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA_DDL)


def corpus_media(docs, id_col: str = "doc_id"):
    """Distributed deterministic image corpus for the near-dup
    pipeline: one 16x16 grayscale 24-bit BMP per document, pixel values
    md5-derived from ``base = doc_id // 3`` (so consecutive id triples
    share a base image — near-dup groups exist at EVERY corpus scale,
    and pair counts stay O(n), never quadratic), with documents at
    ``doc_id % 3 == 2`` perturbed by +128 (mod 256) at one
    id-determined pixel. Real encoded BMP bytes via the multimodal
    encoder — downstream decode runs on genuine format bytes; the
    md5-pixel rule is portable so a DuckDB oracle recomputes the
    expected hashes without a codec. Runs as one mapInPandas over the
    documents scan (per-base image cache inside each batch)."""
    import hashlib

    from docstrange_spark.operators import multimodal as mm

    def gen(batches):
        cache: dict[int, np.ndarray] = {}
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                base = did // 3
                img = cache.get(base)
                if img is None:
                    img = np.empty((16, 16), np.uint8)
                    for y in range(16):
                        for x in range(16):
                            img[y, x] = int(
                                hashlib.md5(
                                    f"img|{base}|{y}|{x}".encode()
                                ).hexdigest()[:2],
                                16,
                            )
                    cache[base] = img
                img = img.copy()
                if did % 3 == 2:
                    py, px = (did // 3) % 16, did % 16
                    img[py, px] = (int(img[py, px]) + 128) % 256
                rgb = np.repeat(img[:, :, None], 3, axis=2)
                rows.append((f"img-{did}", "image", mm.encode_bmp(rgb)))
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "payload"])

    return docs.select(id_col).mapInPandas(
        gen, "media_ref string, kind string, payload binary"
    )


AUDIO_SAMPLES = 260  # 65 frames x 4 samples for the 64-bit fingerprint


def corpus_audio(docs, id_col: str = "doc_id"):
    """Distributed deterministic audio corpus for the acoustic near-dup
    pipeline — the WAV twin of :func:`corpus_media`: one 260-sample
    mono 16-bit PCM clip (8 kHz) per document, amplitudes md5-derived
    from ``base = doc_id // 3`` (consecutive id triples share a base
    clip — near-dup groups exist at EVERY corpus scale, pair counts
    stay O(n)), with documents at ``doc_id % 3 == 2`` perturbed by
    +8192 (mod 65536) over the 8 samples of two id-determined
    consecutive frames (``f0 = doc_id % 63``) — two frame energies
    move, so at most the 3 adjacent sign bits flip: perturbed members
    sit at hamming 0-3 from their base, inside the detection
    threshold but NOT always at 0. Sample rule, all integer so a
    DuckDB oracle recomputes expected fingerprints without a codec:

        u(t) = int(md5(f"aud|{base}|{t}")[:4], 16)      # uint16
        u'(t) = (u + 8192) % 65536  for t in [4*f0, 4*f0+8)
        s(t) = u % 65535 - 32767                        # in [-32767, 32767]

    (the mod-65535 fold keeps s away from -32768, so the int16 WAV
    payload round-trips bit-exactly through the float decode path).
    Bytes are a genuine RIFF/WAVE container written from the int16
    array directly — downstream decode runs the real
    ``multimodal.decode_wav`` codec. One mapInPandas over the
    documents scan, per-base sample cache inside each batch."""
    import hashlib
    import io
    import wave

    def gen(batches):
        cache: dict[int, np.ndarray] = {}
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                base = did // 3
                u = cache.get(base)
                if u is None:
                    u = np.empty(AUDIO_SAMPLES, np.int64)
                    for t in range(AUDIO_SAMPLES):
                        u[t] = int(
                            hashlib.md5(
                                f"aud|{base}|{t}".encode()
                            ).hexdigest()[:4],
                            16,
                        )
                    cache[base] = u
                u = u.copy()
                if did % 3 == 2:
                    t0 = 4 * (did % 63)
                    u[t0 : t0 + 8] = (u[t0 : t0 + 8] + 8192) % 65536
                s = (u % 65535 - 32767).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as f:
                    f.setnchannels(1)
                    f.setsampwidth(2)
                    f.setframerate(8000)
                    f.writeframes(s.tobytes())
                rows.append((f"aud-{did}", "audio", buf.getvalue()))
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "payload"])

    return docs.select(id_col).mapInPandas(
        gen, "media_ref string, kind string, payload binary"
    )
