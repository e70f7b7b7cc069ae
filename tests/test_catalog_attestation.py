"""Attestation-ledger invariants (VERDICT r8 item 2).

Every catalog query must be driver-attested at some point: either it has
held a driver slot (EVER_DRIVER_SEATED), is explicitly queued for the
next rotation (DRIVER_SEAT_QUEUE), or is documented as never-seatable
by construction (NEVER_SEATED_BY_CONSTRUCTION, each name with a standing
alternative verification documented in plans/catalog.py). Adding a
query without registering it in exactly one of these sets fails here —
so future additions can't silently skip driver attestation.
"""

from __future__ import annotations

from urban_mobility_data_pipeline_spark.plans.catalog import (
    DRIVER_QUERY_NAMES,
    DRIVER_SEAT_QUEUE,
    EVER_DRIVER_SEATED,
    NEVER_SEATED_BY_CONSTRUCTION,
    ORACLES,
    QUERIES,
)


def test_ledger_partitions_the_catalog():
    catalog = set(QUERIES)
    union = (
        EVER_DRIVER_SEATED
        | NEVER_SEATED_BY_CONSTRUCTION
        | set(DRIVER_SEAT_QUEUE)
    )
    assert catalog - union == set(), (
        "catalog queries missing from the attestation ledger — seat, "
        f"queue, or document them: {sorted(catalog - union)}"
    )
    assert union - catalog == set(), (
        f"ledger names not in the catalog: {sorted(union - catalog)}"
    )


def test_ledger_sets_are_disjoint():
    assert not (EVER_DRIVER_SEATED & NEVER_SEATED_BY_CONSTRUCTION)
    assert not (EVER_DRIVER_SEATED & set(DRIVER_SEAT_QUEUE))
    assert not (NEVER_SEATED_BY_CONSTRUCTION & set(DRIVER_SEAT_QUEUE))


def test_current_slots_are_recorded_as_seated():
    assert set(DRIVER_QUERY_NAMES) <= EVER_DRIVER_SEATED


def test_queue_entries_are_oracle_backed():
    # Seating a rows-only query would create err=no_oracle driver rows;
    # the queue may only hold hash-checkable queries.
    missing = [n for n in DRIVER_SEAT_QUEUE if n not in ORACLES]
    assert not missing, missing


def test_by_construction_set_is_exactly_the_documented_six():
    # Growing this set requires a documented justification in
    # plans/catalog.py; shrink is fine (a member got seated).
    assert NEVER_SEATED_BY_CONSTRUCTION <= {
        "embedding_pq_codes",
        "embedding_pq_topk",
        "corpus_mixing_weights",
        "corpus_bpe_merges",
        "documents_bpe_token_counts",
        "daily_distinct_users_sketch",
    }
