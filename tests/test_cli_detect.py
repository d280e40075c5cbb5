"""jobs/detect.py CLI: --scoring {cosine,jaccard} in BOTH query modes
(by-node and by-metadata), both with and without --engine-mode, plus the
key-index manifest guard (refuse without manifest unless --trust-key-index).

One subprocess, one JVM: build_session is patched to hand every main() call
the same live session (main() normally stops it)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)

_SCRIPT = r'''
import io, json, os, sys
sys.path.insert(0, {repo!r})
import dedup.session as sess

spark = sess.build_session("cli-test", master="local[4]",
                           shuffle_partitions=8)
spark.stop = lambda: None
sess.build_session = lambda *a, **k: spark

base = " ".join("tok%d word%d item%d" % (i, i * 7, i * 13)
                for i in range(40))
extra = " ".join("zzz%d yyy%d" % (i, i * 3) for i in range(30))
rows = [
    ("https://a.org/1", base, "t-a"),
    ("https://b.org/1", base, "t-a"),              # exact text dup of a
    ("https://c.org/1", base + " " + extra, "t-a"),  # ~0.7 jaccard, same title
    ("https://d.org/1", " ".join("other%d" % i for i in range(60)), "t-d"),
]
corpus = {tmp!r} + "/corpus"
spark.createDataFrame(rows, "url string, text string, title string") \
    .write.parquet(corpus)

sys.path.insert(0, {repo!r} + "/jobs")
import detect

def run(argv):
    sys.argv = ["detect.py"] + argv
    buf, old = io.StringIO(), sys.stdout
    sys.stdout = buf
    try:
        detect.main()
    finally:
        sys.stdout = old
    return {{r["node_url"]: r["similarity"]
            for r in (json.loads(l) for l in buf.getvalue().splitlines()
                      if l.startswith("{{"))}}

for mode in ([], ["--engine-mode"]):
    cos = run(["--corpus", corpus, "--url", "https://a.org/1",
               "--scoring", "cosine", "--threshold", "0.5"] + mode)
    jac = run(["--corpus", corpus, "--url", "https://a.org/1",
               "--scoring", "jaccard"] + mode)
    tag = "engine" if mode else "parity"
    # exact dup: both scorings, jaccard exactly 1.0
    assert cos.get("https://b.org/1") == 1.0, (tag, cos)
    assert jac.get("https://b.org/1") == 1.0, (tag, jac)
    # ~0.7-jaccard neighbor: kept at cosine 0.5, dropped by the 0.8
    # exact-jaccard cut -> the flag changes keep semantics
    assert "https://c.org/1" in cos, (tag, cos)
    assert "https://c.org/1" not in jac, (tag, jac)
    assert "https://d.org/1" not in jac, (tag, jac)
    # by-metadata mode with the same flags (source NOT in corpus: scores
    # a and b at 1.0)
    mcos = run(["--corpus", corpus, "--title", base,
                "--scoring", "cosine", "--threshold", "0.5"] + mode)
    mjac = run(["--corpus", corpus, "--title", base,
                "--scoring", "jaccard"] + mode)
    for url in ("https://a.org/1", "https://b.org/1"):
        assert mcos.get(url) == 1.0, (tag, mcos)
        assert mjac.get(url) == 1.0, (tag, mjac)
    assert "https://c.org/1" in mcos and "https://c.org/1" not in mjac, tag

# --- key-index guard ---------------------------------------------------
fake = {tmp!r} + "/fake_keys"
os.makedirs(fake)
try:
    run(["--corpus", corpus, "--url", "https://a.org/1",
         "--key-index", fake])
    raise AssertionError("expected refusal without manifest")
except SystemExit as e:
    assert "manifest" in str(e), e

from dedup.config import PARITY_CONFIG
from dedup.lsh import unified_group_keys
from dedup.signature import signatures_table
keys_path = {tmp!r} + "/keys"
sigs = signatures_table(spark.read.parquet(corpus), PARITY_CONFIG)
unified_group_keys(sigs, PARITY_CONFIG).write.parquet(keys_path)
trusted = run(["--corpus", corpus, "--url", "https://a.org/1",
               "--key-index", keys_path, "--trust-key-index"])
assert "https://b.org/1" in trusted, trusted
print("CLI_OK")
'''


def test_cli_scoring_flags_and_key_index_guard(tmp_path):
    script = _SCRIPT.format(repo=_REPO, tmp=str(tmp_path))
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "CLI_OK" in proc.stdout
