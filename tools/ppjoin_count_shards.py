"""Back-compat wrapper: the rows-only sharded oracle COUNT lane that
produced `docs/SWEEP_sf10_ppjoin_counts_r11*.log` now lives in
`tools/count_shards.py`, generalized to every pair-generator query with
an injection spec (r12 — link_blocked_pairs joined the registry) and
sharing the marker/predicate builder with the full-value
`shard_check.py` lane so the two cannot drift (ADVICE r11). This shim
preserves the r11 CLI (`SF_DIR [N_SHARDS] [N_PARALLEL]`) for the
committed-log provenance trail; new runs should call count_shards
directly:

  python tools/count_shards.py dedup_ppjoin SF_DIR 16 3 --expect N
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

if __name__ == "__main__":
    from count_shards import main

    # old CLI put SF_DIR first; the generalized tool takes NAME first
    sys.argv.insert(1, "dedup_ppjoin")
    raise SystemExit(main())
