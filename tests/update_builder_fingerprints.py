"""Regenerate tests/builder_fingerprints.json — the snapshot that makes
the hand-maintained catalog._EDITED_ROUND registry self-enforcing.

Run AFTER bumping _EDITED_ROUND for the builders you edited:

    python tests/update_builder_fingerprints.py

test_export_order.test_edited_round_registry_tracks_builder_edits fails
when a builder's fingerprint differs from this snapshot without a
corresponding _EDITED_ROUND bump to the current round — the failure
mode the registry was built to prevent is forgetting the bump entirely
(r6 review finding: nothing could detect the omission).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "builder_fingerprints.json")


def builder_fingerprint(name: str) -> str:
    """Best-effort content hash of an entry's code path: the builder's
    own source plus the full source of every logvision_spark module the
    builder references by import. Edits to catalog-module helpers
    (_t, _run_stream_to_memory, ...) and transitive imports are NOT
    captured — this is a tripwire for the common case (builder or
    directly-imported operator module edited), not a proof."""
    sys.path.insert(0, ROOT)
    from logvision_spark.catalog import CATALOG

    src = inspect.getsource(CATALOG[name].builder)
    h = hashlib.sha256(src.encode())
    mods = sorted(set(re.findall(r"from (logvision_spark[.\w]+) import", src)))
    for mod in mods:
        path = os.path.join(ROOT, *mod.split(".")) + ".py"
        if os.path.exists(path):
            with open(path, "rb") as f:
                h.update(f.read())
    return h.hexdigest()


def main() -> None:
    sys.path.insert(0, ROOT)
    from logvision_spark.catalog import CATALOG

    snap = {name: builder_fingerprint(name) for name in CATALOG}
    with open(SNAPSHOT, "w") as f:
        json.dump(snap, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(snap)} fingerprints to {SNAPSHOT}")


if __name__ == "__main__":
    main()
