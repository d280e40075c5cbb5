"""Extraction byte-parity (SURVEY §5.4): the pandas-UDF output through Spark
must equal the single-node oracle function byte-for-byte, per url — and for
the synthetic corpus the extractor must invert the HTML template exactly."""

from __future__ import annotations

from dedup.extract import extract_text, with_extracted_text
from dedup.synth import corpus_pdf, render_html


class TestExtractOracle:
    def test_roundtrip_simple(self):
        text = "hello world\nsecond paragraph here"
        assert extract_text(render_html(text, "t")) == text

    def test_roundtrip_hot_block(self):
        text = "alpha beta gamma"
        out = extract_text(render_html(text, "t", hot=True))
        assert out.endswith(text) and "cookie notice" in out

    def test_boilerplate_dropped(self):
        html = (b"<html><head><script>x=1</script><style>a{}</style></head>"
                b"<body><nav>MENU</nav><p>real content</p>"
                b"<footer>FOOT</footer></body></html>")
        assert extract_text(html) == "real content"

    def test_entities_and_breaks(self):
        html = b"<body><p>a &amp; b</p><div>c&lt;d</div><br>e</body>"
        assert extract_text(html) == "a & b\nc<d\ne"

    def test_none_and_empty(self):
        assert extract_text(None) is None
        assert extract_text(b"") == ""

    def test_invalid_utf8(self):
        out = extract_text(b"<body><p>ok \xff\xfe bytes</p></body>")
        assert "ok" in out and "�" in out

    def test_no_body_tag(self):
        assert extract_text(b"<p>bare fragment</p>") == "bare fragment"


class TestExtractSparkParity:
    def test_byte_identical_per_url(self, spark):
        pdf = corpus_pdf(200, seed=7)
        df = spark.createDataFrame(pdf[["url", "html", "text"]])
        got = {
            r["url"]: r["extracted"]
            for r in with_extracted_text(df, out_col="extracted")
            .select("url", "extracted").collect()
        }
        for _, row in pdf.iterrows():
            oracle = extract_text(row["html"])
            assert got[row["url"]].encode() == oracle.encode(), row["url"]

    def test_extractor_inverts_template(self, spark):
        # ground-truth `text` column is recovered exactly for non-hot pages
        pdf = corpus_pdf(150, seed=11, hot_frac=0.0)
        df = spark.createDataFrame(pdf[["url", "html", "text"]])
        rows = (with_extracted_text(df, out_col="extracted")
                .select("url", "text", "extracted").collect())
        assert len(rows) == len(pdf)
        for r in rows:
            expect = "\n".join(
                ln.strip() for ln in (r["text"] or "").split("\n")
                if ln.strip())
            assert r["extracted"] == expect, r["url"]


def test_self_closing_script_does_not_swallow_content():
    """'<script src=x/>' has no own closer; the paired-block regex must
    not extend to the NEXT </script> and silently delete the legitimate
    content in between (round-5 review finding)."""
    from dedup.extract import extract_text

    html = (b"<body><p>real</p><script src='x.js'/><p>content A</p>"
            b"<script>var s=1;</script><p>B</p></body>")
    assert extract_text(html) == "real\ncontent A\nB"


def test_unclosed_script_does_not_leak_source():
    """An unclosed <script> with no later closer must not leak raw JS
    into the extracted text (it is dropped to end of document)."""
    from dedup.extract import extract_text

    got = extract_text(b"<body><p>ok</p><script>var leak=1; function f(){}")
    assert got == "ok"
    assert "leak" not in got
