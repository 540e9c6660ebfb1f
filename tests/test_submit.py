"""spark-submit --py-files launch-path smoke test.

The north rule (BASELINE.json) requires the job to launch via
``spark-submit --py-files`` on a multi-executor cluster.  This test pins
the packaging contract end-to-end in a SUBPROCESS: the library is zipped
by ``tools/package_pyfiles.py``, the driver runs from a scratch cwd with
the repo stripped from ``PYTHONPATH``, and every import — driver side
and Python-worker side — must therefore resolve from the zip exactly as
it would on a cluster.  A zip-unsafe resource load (``__file__``
relative data file, missing module) fails here, not at deploy time.

Reference analog: runners/queue_sites launches run_queue_nowrap workers
against the shared frontier; here the one submitted job IS the crawl.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this box"
)
def test_spark_submit_pyfiles_crawl(tmp_path):
    sys.path.insert(0, str(ROOT / "tools"))
    import package_pyfiles

    zip_path = package_pyfiles.build(str(tmp_path / "tripwire_spark.zip"))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    ckpt = tmp_path / "ckpt"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(ROOT / "tools" / "submit_crawl.py"),
            "--synth-hosts", "20",
            "--rounds", "1",
            "--budget", "2",
            "--checkpoint-dir", str(ckpt),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    out = proc.stdout + "\n" + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    m = re.search(r"crawl complete: rounds=(\d+) frontier_urls=(\d+)", out)
    assert m, out[-4000:]
    assert int(m.group(1)) == 1
    assert int(m.group(2)) > 0
    # Checkpoint tables were committed by the submitted job — the resume
    # contract's on-disk half exists without the repo on any path.
    assert (ckpt / "frontier").exists(), list(ckpt.iterdir())
