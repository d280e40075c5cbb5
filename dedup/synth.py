"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Builds the input_hint table `(url, warc_ts, html, text, lang)` at any scale
with planted duplicate families and known ground-truth cluster ids — the
recall oracle for end-to-end tests and the bench input (no external data).

The HTML wraps the ground-truth text in templated boilerplate (nav/header/
footer/script blocks) such that `dedup.extract.extract_text` recovers the
text byte-identically — mirroring the real contract "extracted text must be
byte-identical per url to the reference extractor".

Everything is seeded; the same (n_docs, seed) always yields the same corpus.
"""

from __future__ import annotations

import html as _html
import random
from dataclasses import dataclass

import pandas as pd

_WORDS = (
    "die der und in den von zu das mit sich des auf für ist im dem nicht ein "
    "the of and to in is was he for it with as his on be at by had not are "
    "school learning mathematics physics biology history geography chemistry "
    "lesson teacher student exercise example problem solution analysis theory "
    "planet energy water climate system process structure function cell atom "
    "molecule equation fraction geometry algebra language grammar vocabulary "
    "reading writing science experiment observation hypothesis method result "
    "education knowledge culture society politics economy technology internet"
).split()

_LANGS = ["en", "de", "fr", "es", "zh"]

_BOILERPLATE_NAV = (
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li>'
    '<li><a href="/contact">Contact</a></li></ul></nav>'
)
_BOILERPLATE_FOOTER = (
    '<footer>© 2026 Example Corp — Imprint | Privacy | Terms</footer>'
)

# the hot-band fixture: identical leading boilerplate sentence shared by a
# configurable slice of documents (creates one enormous LSH bucket)
HOT_BOILERPLATE = (
    "cookie notice this website uses cookies to improve your experience "
    "please accept our terms and conditions before continuing to the content"
)


@dataclass
class SynthDoc:
    url: str
    text: str
    lang: str
    cluster: int  # ground-truth cluster id; -1 = unique (no duplicate family)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _paragraphs(rng: random.Random, n_tokens: int) -> str:
    toks = [rng.choice(_WORDS) for _ in range(n_tokens)]
    paras, i = [], 0
    while i < len(toks):
        step = min(rng.randint(40, 80), len(toks) - i)
        paras.append(" ".join(toks[i:i + step]))
        i += step
    return "\n".join(paras)


def _edit_tokens(rng: random.Random, text: str, edit_frac: float) -> str:
    """Token-level edits (substitute/insert/delete) at the given fraction —
    produces near-duplicates above/below the decision boundary."""
    toks = text.replace("\n", " §NL§ ").split(" ")
    n_edits = max(1, int(len(toks) * edit_frac))
    for _ in range(n_edits):
        op = rng.choice(("sub", "ins", "del"))
        i = rng.randrange(len(toks))
        if toks[i] == "§NL§":
            continue
        if op == "sub":
            toks[i] = rng.choice(_WORDS)
        elif op == "ins":
            toks.insert(i, rng.choice(_WORDS))
        elif op == "del" and len(toks) > 10:
            toks.pop(i)
    return " ".join(toks).replace(" §NL§ ", "\n")


def render_html(text: str, title: str, hot: bool = False) -> bytes:
    """Wrap text in boilerplate HTML; extract_text() inverts this exactly."""
    body_paras = "".join(
        f"<p>{_html.escape(p)}</p>" for p in text.split("\n") if p
    )
    hot_block = f"<p>{_html.escape(HOT_BOILERPLATE)}</p>" if hot else ""
    page = (
        "<!DOCTYPE html><html><head>"
        f"<title>{_html.escape(title)}</title>"
        "<script>var tracker = 'xyz';</script>"
        "<style>body { font: 12px sans-serif; }</style>"
        "</head><body>"
        f"{_BOILERPLATE_NAV}"
        "<article>"
        f"{hot_block}{body_paras}"
        "</article>"
        f"{_BOILERPLATE_FOOTER}"
        "</body></html>"
    )
    return page.encode("utf-8")


def _url_variants(base: str, rng: random.Random, n: int) -> list[str]:
    """Variant family collapsing to one normalize_url key (FIXTURES.md §1.3)."""
    host, _, path = base.partition("/")
    forms = [
        f"https://{host}/{path}",
        f"http://{host}/{path}",
        f"https://www.{host}/{path}",
        f"http://www.{host}/{path}/",
        f"https://{host}/{path}?utm_source=mail&utm_campaign=x",
        f"https://www.{host}/{path}/?ref=home",
    ]
    rng.shuffle(forms)
    return forms[:n]


_YT_FORMS = [
    "https://youtu.be/{id}",
    "https://www.youtube.com/watch?v={id}",
    "https://www.youtube.com/watch?v={id}&t=42s",
    "https://www.youtube.com/embed/{id}",
    "https://www.youtube.com/v/{id}",
    "https://www.youtube.com/shorts/{id}",
    "https://www.youtube.com/live/{id}",
    "https://m.youtube.com/watch?v={id}",
]


def _yt_id(rng: random.Random) -> str:
    # lowercase alphabet: normalize_url lowercases before parsing, so mixed
    # case would still collapse — lowercase keeps the fixture self-evident
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789_-"
    return "".join(rng.choice(alpha) for _ in range(11))


def generate_docs(n_docs: int, seed: int = 42,
                  hot_frac: float = 0.05,
                  token_scale: float = 1.0) -> list[SynthDoc]:
    """Planted families (FIXTURES.md §1): exact dups, near dups above/below
    the boundary, url-variant dups, YouTube variants, short texts,
    placeholders, unicode, long docs with shared substrings, hot-band
    boilerplate, unique filler. token_scale multiplies document lengths
    (bench corpora use > 1 so per-doc compute dominates fixed overheads)."""
    rng = random.Random(seed)

    def sc(n: int) -> int:
        return max(1, int(n * token_scale))
    docs: list[SynthDoc] = []
    cluster = 0
    i = 0
    while len(docs) < n_docs:
        i += 1
        roll = rng.random()
        base_url = f"site{i}.example.org/pages/doc-{i}"
        lang = rng.choice(_LANGS)
        # the draw's VALUE is unused (corpus_pdf re-rolls hot-band flags
        # with its own rng) but it must stay: removing it would shift the
        # shared rng stream and regenerate every frozen fixture/corpus
        # differently
        _hot_draw = rng.random() < hot_frac

        if roll < 0.08:  # exact duplicates: same text, k different urls
            text = _paragraphs(rng, rng.randint(sc(120), sc(400)))
            k = rng.randint(2, 4)
            for j in range(k):
                docs.append(SynthDoc(
                    f"mirror{j}.example.net/copy/{i}", text, lang, cluster))
            cluster += 1
        elif roll < 0.18:  # near duplicates, small edits (should match)
            text = _paragraphs(rng, rng.randint(sc(150), sc(500)))
            docs.append(SynthDoc(f"{base_url}", text, lang, cluster))
            for j in range(rng.randint(1, 3)):
                near = _edit_tokens(rng, text, rng.uniform(0.01, 0.05))
                docs.append(SynthDoc(
                    f"site{i}.example.org/pages/doc-{i}-v{j}", near, lang,
                    cluster))
            cluster += 1
        elif roll < 0.24:  # near-threshold negatives (moderate edits)
            text = _paragraphs(rng, rng.randint(sc(150), sc(400)))
            docs.append(SynthDoc(base_url, text, lang, -1))
            far = _edit_tokens(rng, text, rng.uniform(0.35, 0.6))
            docs.append(SynthDoc(f"{base_url}-alt", far, lang, -1))
        elif roll < 0.32:  # url-variant duplicates (same text, variant urls)
            text = _paragraphs(rng, rng.randint(sc(100), sc(300)))
            for u in _url_variants(base_url, rng, rng.randint(2, 4)):
                docs.append(SynthDoc(u, text, lang, cluster))
            cluster += 1
        elif roll < 0.36:  # YouTube variant family
            vid = _yt_id(rng)
            text = _sentence(rng, rng.randint(sc(30), sc(80)))
            forms = list(_YT_FORMS)
            rng.shuffle(forms)
            for f in forms[:rng.randint(2, 4)]:
                docs.append(SynthDoc(f.format(id=vid), text, lang, cluster))
            cluster += 1
        elif roll < 0.40:  # short texts (< 3 words -> single-shingle fallback)
            text = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 2)))
            docs.append(SynthDoc(base_url, text, lang, -1))
        elif roll < 0.43:  # placeholder / degenerate
            text = rng.choice(["", "   ", "string", "n/a", "unknown",
                               "a b c d e f", "\t\n"])
            docs.append(SynthDoc(base_url, text, lang, -1))
        elif roll < 0.47:  # long docs sharing a long exact substring only
            shared = _paragraphs(rng, sc(250))
            for j in range(2):
                own = _paragraphs(rng, rng.randint(sc(800), sc(1200)))
                text = own + "\n" + shared + "\n" + _paragraphs(rng, sc(300))
                # same substring, low global similarity: cluster only for the
                # substring pass (tracked separately with negative-2 marker)
                docs.append(SynthDoc(f"{base_url}-sub{j}", text, lang, -2))
        else:  # unique filler
            text = _paragraphs(rng, rng.randint(sc(80), sc(400)))
            docs.append(SynthDoc(base_url, text, lang, -1))
    return docs[:n_docs]


def corpus_pdf(n_docs: int, seed: int = 42, hot_frac: float = 0.05,
               epoch: int = 1_700_000_000,
               token_scale: float = 1.0) -> pd.DataFrame:
    """pandas frame with the full input_hint schema + ground-truth columns
    (truth_cluster; html embeds text; warc_ts deterministic)."""
    rng = random.Random(seed + 1)
    docs = generate_docs(n_docs, seed, hot_frac, token_scale)
    rows = []
    for k, d in enumerate(docs):
        title = (d.text.split("\n", 1)[0][:60] or "untitled")
        rows.append({
            "url": d.url,
            "warc_ts": pd.Timestamp(epoch + k * 17, unit="s", tz="UTC"),
            "html": render_html(d.text, title, hot=rng.random() < hot_frac),
            "text": d.text,
            "lang": d.lang,
            "truth_cluster": d.cluster,
        })
    return pd.DataFrame(rows)


def write_corpus(spark, path: str, n_docs: int, seed: int = 42,
                 hot_frac: float = 0.05, partitions: int = 8,
                 token_scale: float = 1.0) -> None:
    """Materialize the corpus as parquet (Iceberg-shaped schema; this sandbox
    has no iceberg-spark-runtime jar, so plain parquet stands in behind the
    same schema — SURVEY §1.3). Generation is parallelized across seeds on
    executors for large n_docs (each shard is independently deterministic).

    Sharded generation (> 20k docs) rounds n_docs UP to a whole number of
    shards: per_shard = ceil(n_docs / n_shards), so the written corpus has
    n_shards * per_shard rows (e.g. 100_000 over 512 shards -> 100_352).
    Deliberate: truncating the last shard would change the frozen rng
    streams and invalidate every banked bench invariant; consumers (bench,
    recall) count the actual rows and report them honestly."""
    if n_docs <= 20_000:
        pdf = corpus_pdf(n_docs, seed, hot_frac, token_scale=token_scale)
        df = spark.createDataFrame(pdf)
        df.repartition(partitions, "url").write.mode("overwrite").parquet(path)
        return
    # shard generation across executors: derived seeds, disjoint url spaces
    n_shards = max(8, partitions)
    per_shard = (n_docs + n_shards - 1) // n_shards
    shards = spark.range(n_shards).select("id")

    def gen(batches):
        for pdf_in in batches:
            for shard in pdf_in["id"]:
                sp = corpus_pdf(per_shard, seed + 1000 * (int(shard) + 1),
                                hot_frac, token_scale=token_scale)
                # shard-disjoint hosts, preserving each variant family's
                # internal structure (www./protocol variants still collapse)
                sp["url"] = sp["url"].str.replace(
                    ".example.", f".s{int(shard)}.example.", regex=False)
                # truth ids are shard-local counters: offset them into
                # disjoint ranges so (truth_cluster) is GLOBALLY unique —
                # url-host shard markers can't disambiguate youtube-form
                # urls, so downstream recall math needs this. 2^40 per
                # shard keeps the ranges disjoint up to a trillion docs
                # per shard while staying far inside int64 (recall math
                # only needs uniqueness, so renumbering is harmless)
                mask = sp["truth_cluster"] >= 0
                sp.loc[mask, "truth_cluster"] += (int(shard) + 1) * (1 << 40)
                yield sp

    schema = ("url string, warc_ts timestamp, html binary, text string, "
              "lang string, truth_cluster long")
    shards.mapInPandas(gen, schema=schema) \
        .repartition(partitions, "url").write.mode("overwrite").parquet(path)
