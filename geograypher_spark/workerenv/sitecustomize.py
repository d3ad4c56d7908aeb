"""Python-worker interpreter patch: mtime-guarded zip import cache refresh.

WHY THIS EXISTS (measured in this repo, round 5): pyspark's per-task worker
setup calls ``importlib.invalidate_caches()`` unconditionally
(``pyspark/worker_util.py:144``, ``setup_spark_files``) so that files added
via ``SparkContext.addPyFile`` mid-job become importable. On Python 3.11,
``zipimport.zipimporter.invalidate_caches`` re-parses the ENTIRE zip central
directory every call — and ``$SPARK_HOME/python/lib/pyspark.zip`` (~3.5 MB,
thousands of entries) is always on the worker's ``sys.path``. The result is
a fixed ~125 ms (300 ms under 32-way concurrency) of pure CPU on EVERY
Python task, dwarfing small Arrow tasks: a trivial 128-partition
``mapInPandas`` measured 1.7 s warm at local[32]; stack-sampling the workers
put the time squarely in ``zipimport._read_directory`` via
``invalidate_caches``.

THE PATCH: re-read a zip's directory only when the archive's
``(st_mtime_ns, st_size)`` changed since the last read — exactly the
semantics CPython 3.12 gave ``zipimporter.invalidate_caches`` (gh-87004);
this is a backport, not a behavior fork. A zip REPLACED on disk mid-session
is still noticed (stat changes); a zip that did not change is no longer
re-parsed per task. Newly added path entries (``addPyFile`` copies into the
spark-files dir; new eggs/zips append new path entries) construct fresh
importers and are unaffected.

DEPLOYMENT: ``geograypher_spark.session.get_spark`` prepends this module's
directory to ``$PYTHONPATH`` before the JVM starts; every forked worker
(and the daemon they fork from) imports ``sitecustomize`` at interpreter
startup. The module must stay import-error-proof: a failure here would take
down every worker, so everything is wrapped.
"""

try:
    import os as _os
    import zipimport as _zipimport

    _orig_invalidate = _zipimport.zipimporter.invalidate_caches

    def _invalidate_caches(self):
        try:
            st = _os.stat(self.archive)
            stamp = (st.st_mtime_ns, st.st_size)
        except OSError:
            # archive gone/unreadable: defer to the original (it resets
            # internal state so later imports fail loudly, as upstream)
            _orig_invalidate(self)
            return
        if getattr(self, "_gg_zip_stamp", None) == stamp:
            return
        _orig_invalidate(self)
        try:
            self._gg_zip_stamp = stamp
        except AttributeError:
            pass

    # only patch interpreters that still pay the unconditional re-read
    # (CPython >= 3.12 ships the mtime guard natively)
    import sys as _sys

    if _sys.version_info < (3, 12):
        _zipimport.zipimporter.invalidate_caches = _invalidate_caches
except Exception:  # pragma: no cover - never break worker startup
    pass
