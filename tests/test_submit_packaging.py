"""spark-submit --py-files deployment packaging (north_rule: "runs via
spark-submit --py-files on multi-executor clusters").

The zip built by scripts/package.py is what every executor python
worker imports the engine from on a real cluster, so these tests prove
(a) the archive carries the package AND its vendored data, (b) the
package imports and works under zipimport — where ``__file__`` is not
an openable path (the publicsuffix list must load via
importlib.resources), and (c) the whole job file runs end-to-end under
an actual ``spark-submit --py-files`` invocation (slow-marked).
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from package import build_zip  # noqa: E402


@pytest.fixture(scope="module")
def pkg_zip(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dist") / "krawler_spark.zip")
    build_zip(out)
    return out


def test_zip_contains_package_and_data(pkg_zip):
    import zipfile

    names = set(zipfile.ZipFile(pkg_zip).namelist())
    assert "krawler_spark/engine.py" in names
    assert "krawler_spark/functions/kanon.py" in names
    assert "krawler_spark/functions/data/public_suffix_list.dat" in names
    assert not any(n.endswith(".pyc") for n in names)


def test_zipimport_psl_loads(pkg_zip):
    """Import kanon FROM THE ZIP in a clean interpreter: open() on the
    in-archive path fails, so this passes only through the
    importlib.resources fallback — the exact executor-side code path."""
    prog = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, sys.argv[1])
        from krawler_spark.functions import kanon
        assert "zip" in kanon.__file__ or ".zip" in kanon.__file__, kanon.__file__
        # PSL semantics through the zip: multi-label rule, wildcard *.ck,
        # exception !www.ck (KrawlUrl.kt:300-310 split)
        assert kanon.public_suffix("www.example.co.uk") == "co.uk"
        assert kanon.split_domain("a.b.example.co.uk") == (
            "co.uk", "example.co.uk", "a.b")
        assert kanon.public_suffix("anything.ck") == "anything.ck"
        assert kanon.split_domain("www.ck")[1] == "www.ck"
        print("OK")
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", prog, pkg_zip],
        capture_output=True, text=True, cwd="/", timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip().endswith("OK")


@pytest.mark.slow
def test_spark_submit_end_to_end(pkg_zip, tmp_path):
    """The real deployment: spark-submit --py-files zip submit_crawl.py
    on a tiny deterministic corpus; asserts the job prints its metrics
    JSON and visits the reachable set."""
    import pyspark

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    assert os.path.exists(submit)

    # tiny 2-host corpus written with plain pyarrow (no session reuse —
    # the submitted job must build its own)
    import pyarrow as pa
    import pyarrow.parquet as pq

    def page(url, links):
        html = "<html><body>" + "".join(
            f'<a href="{l}">x</a>' for l in links) + "</body></html>"
        return url, html.encode(), "text " + url, "en"

    rows = [
        page("http://a.test/", ["http://a.test/1", "http://b.test/"]),
        page("http://a.test/1", []),
        page("http://b.test/", ["http://b.test/1"]),
        page("http://b.test/1", []),
    ]
    tbl = pa.table({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "html": pa.array([r[1] for r in rows], pa.binary()),
        "text": [r[2] for r in rows],
        "lang": [r[3] for r in rows],
    })
    corpus = str(tmp_path / "corpus.parquet")
    pq.write_table(tbl, corpus)
    seeds = tmp_path / "seeds.txt"
    seeds.write_text("http://a.test/\nhttp://b.test/\n")

    env = dict(os.environ, PYTHONPATH="")
    r = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", pkg_zip,
         os.path.join(REPO, "scripts", "submit_crawl.py"),
         "--corpus", corpus, "--warehouse", str(tmp_path / "wh"),
         "--seeds", str(seeds), "--max-rounds", "5"],
        capture_output=True, text=True, env=env, timeout=600, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-4000:]
    out = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert out, r.stdout
    metrics = json.loads(out[-1])
    assert metrics["visited"] == 4, metrics
