"""Package sparkfuse for cluster submission.

Builds the zip that the north_rule's deployment form ships to executors:

    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files sparkfuse.zip jobs/build_forest_job.py ...

Only the package's .py files go in (no tests, no __pycache__), archived at
the ``sparkfuse/`` root so the zip lands directly on sys.path. Deterministic
output: fixed timestamps, sorted entries — the same tree zips to the same
bytes, so cluster deploys can be content-addressed.
"""

from __future__ import annotations

import os
import sys
import zipfile


def make_zip(out_path: str | None = None) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = out_path or os.path.join(repo, "dist", "sparkfuse.zip")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    pkg = os.path.join(repo, "sparkfuse")
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, repo), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, full in sorted(entries):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    print(make_zip(sys.argv[1] if len(sys.argv) > 1 else None))
