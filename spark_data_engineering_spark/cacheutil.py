"""Digest helpers for /tmp-cached derived state (staged format copies,
persisted ANN indexes, streaming-replay TxnTables).

Data-only caches key on the source file's (path, mtime, size). Caches of
DERIVED state must also key on the code that derived it — otherwise a
code change silently reuses state computed by the old code and the
correctness gate records green evidence for a path that never ran
(round-4 review finding). ``code_digest`` folds the source bytes of the
implementing modules into the key, so any edit invalidates the cache.
"""

from __future__ import annotations

import hashlib


def code_digest(*modules) -> str:
    """Hex digest of the given modules' source bytes."""
    h = hashlib.md5()
    for m in modules:
        with open(m.__file__, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]
