"""Corpus generator + extraction invariants (FIXTURES.md §1, input_hint)."""

from __future__ import annotations

import hashlib

from fastcdc_rs_spark.corpus import corpus_pandas, extract_text_bytes


def test_corpus_deterministic():
    a = corpus_pandas(n_docs=100, seed=7)
    b = corpus_pandas(n_docs=100, seed=7)
    assert list(a.text) == list(b.text)
    assert list(a.url) == list(b.url)
    c = corpus_pandas(n_docs=100, seed=8)
    assert list(a.text) != list(c.text)


def test_extraction_byte_identical_per_url():
    # per-row invariant from BASELINE.json input_hint: byte-identical
    # extracted text per url, pinned via sha256 goldens
    pdf = corpus_pandas(n_docs=50, seed=42)
    for _, row in pdf.iterrows():
        assert extract_text_bytes(bytes(row.html)) == row.text

    # golden pins: extraction is versioned — changing the extractor or the
    # generator must break these on purpose
    digest = hashlib.sha256(
        "".join(
            hashlib.sha256(row.text.encode()).hexdigest()
            for _, row in pdf.iterrows()
        ).encode()
    ).hexdigest()
    assert digest == GOLDEN_CORPUS_SHA, f"corpus/extractor drifted: {digest}"


def test_dup_structure_present():
    pdf = corpus_pandas(n_docs=400, seed=42)
    kinds = set(pdf.dup_kind)
    assert {"giant", "exact", "near", "tiny", "boiler", "unique", "zeros"} <= kinds
    giant = pdf[pdf.dup_kind == "giant"]
    assert len(giant) >= 20
    # giant cluster is one exact hot bucket (the skew stressor)
    assert giant.text.nunique() == 1
    exact = pdf[pdf.dup_kind == "exact"]
    assert exact.groupby("true_cluster").text.nunique().max() == 1


def test_extraction_edge_cases():
    assert extract_text_bytes(b"no markers here") == "no markers here"
    assert extract_text_bytes(b"<body></body>") == ""
    # nested/malformed bodies fall into the tag-strip branch (v2)
    assert extract_text_bytes(b"a<body>x</body>b<body>y</body>") == "x b y"


def test_extraction_malformed_html_v2():
    # attributes on body, script/style/comment stripping, entity decode
    html = (
        b'<html><head><script>var x = "<body>evil</body>";</script></head>'
        b'<body class="main">\n  Hello &amp; <b>world</b>!'
        b"<style>p { color: red }</style>"
        b"<!-- hidden <body>comment</body> -->"
        b" Caf\xc3\xa9 &lt;tag&gt; done </body><footer>f</footer></html>"
    )
    # tags become separators (safe for block elements), hence "world !"
    assert (
        extract_text_bytes(html)
        == "Hello & world ! Café <tag> done"
    )
    # no closing body -> whole-document fallback, tags stripped
    assert extract_text_bytes(b"<html><body>abc <i>def") == "abc def"
    # unterminated script must not swallow the rest silently... it does by
    # spec (script never closes), but the body fast path is unaffected:
    assert extract_text_bytes(b"<body>plain text</body><script>x") == "plain text"
    # invalid utf-8 decodes with replacement, never raises
    out = extract_text_bytes(b"<body>ok \xff\xfe bytes</body>")
    assert out.startswith("ok ") and out.endswith(" bytes")
    # double-decode guard: &amp;lt; is literal "&lt;", not "<"
    assert extract_text_bytes(b"<body>a &amp;lt; <b>b</b></body>") == "a &lt; b"


# computed once from the verified generator (seed=42, n=50); see
# test_extraction_byte_identical_per_url
GOLDEN_CORPUS_SHA = "e1c85b305b10066c746d22b441fff39850b261bcb6114b126af36d5eeeaddb4f"
