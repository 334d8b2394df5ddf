"""Make ``google.protobuf`` importable in this container.

``transformWithStateInPandas`` (streaming/stateful2.py) speaks protobuf
to the JVM state server via pyspark's generated ``StateMessage_pb2``,
but this container has no installed ``protobuf`` distribution and no
network to install one. A complete pure-Python protobuf runtime (6.32)
does ship inside the host's google-cloud-sdk app-engine platform, so we
borrow it:

- driver side: append the platform dir to ``sys.path`` and no-op the
  gencode/runtime minor-version gate (gencode 6.33 vs runtime 6.32 —
  the generated code uses no 6.33-only feature; serialize/parse
  round-trips verified at import time below);
- worker side: Spark's Python workers are fresh interpreters, so the
  same setup must happen there *before* pyspark imports the pb2. The
  ``_pbshim`` directory contains a ``sitecustomize.py`` that repeats the
  setup at interpreter start; putting it on ``PYTHONPATH`` before the
  SparkSession is created makes every local-mode worker inherit it.

If the platform runtime is absent (other hosts), everything degrades to
the previous behavior: ``ensure_protobuf()`` returns False and the
stateful2 test skips.
"""

from __future__ import annotations

import os
import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
_SHIM_DIR = os.path.join(os.path.dirname(__file__), "_pbshim")


def _patch_version_gate() -> None:
    """Disable the protobuf gencode>runtime minor-version refusal."""
    try:
        from google.protobuf import runtime_version

        runtime_version.ValidateProtobufRuntimeVersion = (  # type: ignore[assignment]
            lambda *a, **k: None
        )
    except Exception:
        pass


def _roundtrip_ok() -> bool:
    """Smoke-check the borrowed runtime against pyspark's gencode."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        m = sm.StateRequest()
        m.version = 2
        m2 = sm.StateRequest()
        m2.ParseFromString(m.SerializeToString())
        return m2.version == 2
    except Exception:
        return False


def ensure_protobuf() -> bool:
    """Return True iff ``google.protobuf`` is usable for the stateful
    streaming API, borrowing the app-engine runtime if needed. Must run
    before the SparkSession is created for workers to inherit the
    ``PYTHONPATH`` shim."""
    have = False
    try:
        from google.protobuf import descriptor  # noqa: F401

        # a real installed protobuf: leave its version gate and the
        # process environment alone unless the gencode actually refuses
        # to load (then fall through to the patched path below)
        if _roundtrip_ok():
            return True
        have = True
    except ImportError:
        if os.path.isdir(os.path.join(_APPENGINE, "google", "protobuf")):
            # evict any namespace-only `google*` poisoned into sys.modules
            # by the failed import (e.g. spark-core jar .proto resources)
            for m in [
                m for m in sys.modules if m == "google" or m.startswith("google.")
            ]:
                del sys.modules[m]
            if _APPENGINE not in sys.path:
                sys.path.append(_APPENGINE)
            try:
                from google.protobuf import descriptor  # noqa: F401

                have = True
            except ImportError:
                return False
    if not have:
        return False
    _patch_version_gate()
    if not _roundtrip_ok():
        return False
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    if _SHIM_DIR not in parts:
        parts.append(_SHIM_DIR)
        os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    return True


def build_executor_zip() -> str | None:
    """Package the borrowed protobuf runtime as an ``addPyFile``-able zip
    (built once under /tmp): ``google/`` made a REGULAR package (empty
    ``__init__.py``) so it cleanly wins over the spark-core jar's
    ``google/protobuf/*.proto`` namespace portion, and
    ``runtime_version.py`` patched to a no-op gate (gencode 6.33 vs this
    runtime 6.32 — verified compatible by ``_roundtrip_ok``). This is
    the RUNTIME remedy: Spark workers add py-files to ``sys.path`` at
    task setup, so it works even when the JVM was launched before
    ``ensure_protobuf`` could export the PYTHONPATH shim."""
    import hashlib
    import zipfile

    src_root = os.path.join(_APPENGINE, "google", "protobuf")
    if not os.path.isdir(src_root):
        return None
    out = "/tmp/spark_de_pbshim/google_protobuf.zip"
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = f"{out}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("google/__init__.py", "")
        for dirpath, _dirnames, filenames in os.walk(src_root):
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, os.path.join(_APPENGINE))
                with open(full, "rb") as f:
                    data = f.read()
                if fn == "runtime_version.py" and os.path.dirname(rel) == os.path.join(
                    "google", "protobuf"
                ):
                    data += (
                        b"\n\n\ndef ValidateProtobufRuntimeVersion(*a, **k):"
                        b"\n    return None  # gate relaxed, see builder\n"
                    )
                zf.writestr(rel, data)
    os.replace(tmp, out)
    return out


def ensure_executor_protobuf(spark) -> None:
    """Ship the patched runtime to Spark workers at RUNTIME — effective
    regardless of when the session was created relative to
    ``ensure_protobuf``:

    - ``addPyFile`` covers task workers (they add py-files to
      ``sys.path`` during per-task setup);
    - the ``transformWithState`` pre-init DRIVER worker never reads
      py-files — its PYTHONPATH comes from the function's ``envVars``,
      which pyspark copies from the live ``sc.environment`` dict at
      query-creation time, so injecting the zip path there covers it.

    Both are idempotent and a no-op where protobuf is installed."""
    zp = build_executor_zip()
    if zp is None:
        return
    try:
        spark.sparkContext.addPyFile(zp)
    except Exception:
        # already added (Spark refuses duplicate adds) or static session
        pass
    try:
        env = spark.sparkContext.environment
        parts = [
            p
            for p in env.get("PYTHONPATH", os.environ.get("PYTHONPATH", "")).split(
                os.pathsep
            )
            if p
        ]
        # repo root too: the driver worker cloudpickle-loads our
        # StatefulProcessor BY REFERENCE, so the package must be
        # importable there even under a foreign driver cwd
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        for p in (zp, repo_root):
            if p not in parts:
                parts.append(p)  # zip on sys.path: zipimport, patched gate
        env["PYTHONPATH"] = os.pathsep.join(parts)
    except Exception:
        pass
