"""Driver-evidence freshness gate (round-9 VERDICT #2): the rotation
protocol used to live as prose in ``catalog/__init__.py``; this test makes
it CI, the way the shared-fragment pin registry did for oracle fragments.

Mechanics
---------
The committed ``CORRECTNESS_r*.json`` files are the driver's evidence
record; the "current round" is the newest committed file + 1 (the window
in ``catalog._DRIVER_WINDOW`` is what the CURRENT round's driver will
check, so in-window queries project to current-round evidence).

Three enforced rules:
1. **No structural lag** — every registered query either has some driver
   evidence already or sits in the current window.
2. **Freshness bound** — no hash-checkable query's projected evidence may
   be older than ``MAX_EVIDENCE_AGE_ROUNDS``, unless it is explicitly
   staged by name for the NEXT round in ``NEXT_WINDOW_STAGED`` (deleting
   a staged name makes this test fail — the VERDICT's done-criterion).
   Rows-only queries (``oracle is None``) are exempt: a window slot buys
   them no hash evidence.
3. **Changed contracts get a slot** — any entry in ``CHANGED_CONTRACTS``
   whose change round is newer than its latest driver evidence must be in
   the current window. Record every output-contract or plan-shape change
   there in the same commit that makes it (CLAUDE.md hard rule).
"""

from __future__ import annotations

import glob
import json
import os
import re

from platform_etl_backend_spark.catalog import QUERIES
from platform_etl_backend_spark.catalog import _DRIVER_WINDOW

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# A query's driver evidence may be at most this many rounds old (counting
# the current window as current-round evidence).
MAX_EVIDENCE_AGE_ROUNDS = 6

# Queries whose evidence is allowed to exceed the age bound THIS round
# because they are staged, by name, for the next round's window. The
# round-11 rotation MUST consume these first (after fronted changed
# contracts / new queries). Stale-but-unstaged is a CI failure.
NEXT_WINDOW_STAGED: frozenset[str] = frozenset({
    # twice-checked (r1+r2) round-2-latest rows — the oldest remaining
    # evidence after the round-10 window; 55 stale rows competed for 50
    # round-10 slots and these lost on check-count (each already has two
    # green driver rounds banked).
    "q_collect_set",
    "q_flatten_collect",
    "q_running_collect",
    "q_sorted_names_array",
    "q_topk_banded_labels",
    # displaced from the round-10 window mid-round (twice-checked r2+r3)
    # to seat the changed-plan q_entity_resolution / q_logreg_gd
    "q_audio_decode",
    "q_image_decode",
    # displaced (twice-checked r2+r3) to seat the kernel-rewired IVF pair
    "q_asof_join",
    "q_range_join",
    # displaced (twice-checked r2+r3) to seat the block-tiled near-dup
    "q_dedup_clusters",
})

# {query: round its output contract / plan shape last changed}. Append in
# the same commit as the change; the query must then hold a window slot
# until the driver re-checks it.
CHANGED_CONTRACTS: dict[str, int] = {
    # flatten_cat gained the reference's trim+comma element normalization
    # (Helpers.scala:154-167) in round 10.
    "q_flatten_cat_labels": 10,
    # round-10 fuzzy-verify rewire (bounded levenshtein, verify-before-
    # distinct, zip_with+substr transposition, bucket-checkpoint fence):
    # same output, new plan shape for every _variant_pair_candidates
    # consumer.
    "q_fuzzy_damerau": 10,
    "q_fuzzy_token_join": 10,
    "q_entity_resolution": 10,
    # round-10 iterative-plan fixes: graph closure path doubling (4 BSP
    # rounds, was 15 one-hop) and logreg's per-step weight checkpoint.
    "q_graph_closure": 10,
    "q_logreg_gd": 10,
    # round-10 Arrow cell-pair kernel (bit-identical sequential fold) for
    # the IVF pair-scoring stage.
    "q_ann_ivf": 10,
    "q_ann_ivf_kmeans": 10,
    "q_ann_ivf_nprobe": 10,
    # round-10 block-tiled all-pairs kernel for the exact near-dup baseline.
    "q_embedding_near_dup": 10,
    # round-10 within-cell pair stage through the Arrow cell kernel.
    "q_semantic_dedup": 10,
}


def _evidence() -> tuple[dict[str, int], int]:
    latest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rounds.append(rnd)
        with open(path) as fh:
            data = json.load(fh)
        entries = data.get("queries", data)
        names = entries.keys() if isinstance(entries, dict) else [
            e["name"] for e in entries
        ]
        for name in names:
            latest[name] = max(rnd, latest.get(name, 0))
    assert rounds, "no committed CORRECTNESS_r*.json evidence files"
    return latest, max(rounds) + 1


def test_no_structural_lag():
    latest, _ = _evidence()
    missing = [
        n for n in QUERIES if n not in latest and n not in _DRIVER_WINDOW
    ]
    assert not missing, (
        "registered queries with no driver evidence and no window slot "
        f"(front them in _DRIVER_WINDOW): {sorted(missing)}"
    )


def test_evidence_freshness_bound():
    latest, current = _evidence()
    stale = {}
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue  # rows-only by design: a slot buys no hash evidence
        projected = current if name in _DRIVER_WINDOW else latest.get(name, 0)
        age = current - projected
        if age > MAX_EVIDENCE_AGE_ROUNDS and name not in NEXT_WINDOW_STAGED:
            stale[name] = projected
    assert not stale, (
        f"driver evidence older than {MAX_EVIDENCE_AGE_ROUNDS} rounds and "
        f"not staged for the next window (add to _DRIVER_WINDOW or stage "
        f"by name in NEXT_WINDOW_STAGED): {stale}"
    )


def test_staged_names_are_real_and_still_stale():
    """Staged exemptions must stay honest: every staged name is a
    registered hash-checkable query that actually NEEDS the exemption —
    a staged row that got fresh evidence (or a typo) fails here."""
    latest, current = _evidence()
    for name in sorted(NEXT_WINDOW_STAGED):
        assert name in QUERIES, f"staged name not in registry: {name}"
        assert QUERIES[name].oracle is not None, (
            f"rows-only query needs no staging (exempt already): {name}"
        )
        projected = current if name in _DRIVER_WINDOW else latest.get(name, 0)
        assert current - projected > MAX_EVIDENCE_AGE_ROUNDS, (
            f"staged name is no longer stale — remove it: {name} "
            f"(evidence round {projected})"
        )


def test_changed_contracts_hold_a_window_slot():
    latest, _ = _evidence()
    missing = [
        name
        for name, changed_round in CHANGED_CONTRACTS.items()
        if changed_round > latest.get(name, 0) and name not in _DRIVER_WINDOW
    ]
    assert not missing, (
        "contract changed since last driver check but no window slot: "
        f"{sorted(missing)}"
    )


def test_window_is_valid():
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    unknown = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    assert not unknown, f"window names not in registry: {unknown}"
    # the harness checks the FIRST 50 registered queries — the window
    # reorder must actually have applied
    assert list(QUERIES)[:50] == list(_DRIVER_WINDOW)
