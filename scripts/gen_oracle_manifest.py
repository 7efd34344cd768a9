"""Freeze a (source + oracle SQL) hash per full-oracle registry key.

Writes tests/oracle_manifest.json.  The rotation-invariant test
(tests/test_entry_contract.py) asserts that every full-oracle key
OUTSIDE the current 50-seat driver window still hashes to its
manifest entry: a key whose implementation or oracle changed after
its last recorded driver row can then no longer hide outside the
window on a stale full-pass row (the r03 emb_quantize_int8 failure
class) — the test fails until the key is seated in _FIRST_KEYS or
this manifest is deliberately regenerated (a reviewable diff).

Limitation: the hash covers the key's own function source and SQL
string, not shared helpers it calls — a helper-only change still
needs the window-rotation judgment call.  Keys whose CORE behavior
lives in a dedicated private helper close this gap by declaring
``fn._hash_extra = (helper, ...)`` (see key_hash); only the generic
shared infra (_t, _scratch_dir, _stream_src_dir) stays under the
judgment-call rule.

Usage: PYTHONPATH=. python scripts/gen_oracle_manifest.py
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def key_hash(fn, sql: str) -> str:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    # A key function that delegates its core behavior to a private
    # helper declares it via `fn._hash_extra = (helper, ...)` so the
    # helper's source is hashed too — otherwise a helper edit leaves
    # the frozen hash unchanged and the key could sit outside the
    # driver window on stale evidence (the blind spot documented
    # above, closed for the plan/src helpers in r5).
    for helper in getattr(fn, "_hash_extra", ()):
        try:
            src += "\n----\n" + inspect.getsource(helper)
        except (OSError, TypeError):
            src += "\n----\n" + repr(helper)
    return hashlib.md5((src + "\n----\n" + sql).encode()).hexdigest()


def build() -> dict[str, str]:
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    return {
        key: key_hash(q[key], sql)
        for key, sql in sorted(entrymod.oracle_sql().items())
    }


def main() -> None:
    path = os.path.join(REPO, "tests", "oracle_manifest.json")
    with open(path, "w") as f:
        json.dump(build(), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
