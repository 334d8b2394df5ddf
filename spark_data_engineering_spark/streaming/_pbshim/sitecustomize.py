"""Interpreter-start shim for Spark Python workers (see
``streaming/protobuf_compat.py``): expose the google-cloud-sdk's bundled
pure-Python protobuf runtime and relax its gencode minor-version gate so
pyspark's ``StateMessage_pb2`` (gencode 6.33) loads against runtime 6.32.
Present on worker ``sys.path`` via PYTHONPATH; harmless elsewhere.

Subtlety: Spark puts ``spark-core_*.jar`` on worker ``sys.path``, and the
jar carries ``google/protobuf/*.proto`` resources — a failed import of
``google.protobuf`` caches a jar-backed *namespace* package in
``sys.modules`` that permanently shadows the real runtime appended later.
Any poisoned ``google*`` entries must be evicted before retrying.
"""

import os
import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _usable() -> bool:
    try:
        from google.protobuf import runtime_version  # noqa: F401

        return True
    except ImportError:
        return False


if not _usable() and os.path.isdir(os.path.join(_APPENGINE, "google", "protobuf")):
    for _m in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[_m]
    if _APPENGINE not in sys.path:
        sys.path.append(_APPENGINE)

try:
    from google.protobuf import runtime_version

    runtime_version.ValidateProtobufRuntimeVersion = (  # type: ignore[assignment]
        lambda *a, **k: None
    )
except Exception:
    pass
