"""spark-submit --py-files compatibility: the package must import and run
from a zip archive (that is exactly how --py-files ships code to executors —
the zip lands on sys.path via zipimport)."""

import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_package_imports_and_runs_from_zip(tmp_path):
    zpath = tmp_path / "probminhash_spark.zip"
    pkg = REPO / "probminhash_spark"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in pkg.rglob("*.py"):
            z.write(f, f.relative_to(REPO))
    # fresh interpreter whose ONLY source of the package is the zip — a
    # kernel actually executes, proving no __file__/data-file dependence
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import probminhash_spark\n"
        "assert 'probminhash_spark.zip' in probminhash_spark.__file__, probminhash_spark.__file__\n"
        "import numpy as np\n"
        "from probminhash_spark.kernels.probminhash import probminhash3a_single\n"
        "sig, vals = probminhash3a_single(np.arange(50, dtype=np.uint64),"
        " np.ones(50), 16)\n"
        "assert sig.shape == (16,) and np.isfinite(vals).all()\n"
        "from probminhash_spark.config import DedupConfig\n"
        "DedupConfig()\n"
        "print('ZIP_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(zpath)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo so the zip is the only source
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIP_OK" in out.stdout
