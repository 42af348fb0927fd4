"""Package the engine for ``spark-submit --py-files``.

Produces ``dist/information_retrieval_system_spark.zip`` containing the
package (no tests, no caches).  Cluster usage:

    python tools/make_pyfiles.py
    spark-submit \\
        --py-files dist/information_retrieval_system_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
        your_job.py

where ``your_job.py`` does e.g.::

    from information_retrieval_system_spark.config import EngineConfig
    from information_retrieval_system_spark.index.checkpoint import ResumableIndexBuild
    corpus = spark.read.format("iceberg").load("catalog.db.corpus")
    ResumableIndexBuild(corpus, "s3://bucket/index", EngineConfig(),
                        doc_col="doc_id", text_col="content").run()
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "information_retrieval_system_spark"


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
