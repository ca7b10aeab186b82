"""Property-based check of the core LWW semantic (SURVEY §5 model):
for ANY interleaving of upserts/deletes/duplicate deliveries split
across micro-batches in any order, the lake's final live state equals
the trivially-correct oracle "per key, the max-LSN event wins; a
winning delete removes the key" (reference ON CONFLICT rule,
db.py:249-269).

Spark jobs dominate runtime, so the strategy space is explored with a
small bounded number of examples; hypothesis still owns shrinking, so
a failure reproduces minimally.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from tests.test_merge_unit import live, mk_table, upd


# distinct logical events have distinct (key, lsn); duplicate
# DELIVERIES (exact copies, possibly in a later batch) are layered on
# top by the `dup_every` knob — matching at-least-once Kafka semantics
events_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),            # key id
        st.booleans(),                # delete?
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=events_strategy,
    order_seed=st.integers(0, 2**16),
    n_batches=st.integers(1, 4),
    dup_every=st.integers(2, 7),
)
def test_lww_merge_matches_max_lsn_oracle(
    spark, tmp_path_factory, events, order_seed, n_batches, dup_every
):
    import random

    from ton_etl_spark.lake.merge import merge_into

    rows = [
        {
            "repo": f"r{k}",
            "path": "p",
            "lsn": i + 1,
            "op": "d" if dead else "u",
            "content": None if dead else f"c{k}-{i + 1}",
        }
        for i, (k, dead) in enumerate(events)
    ]
    # at-least-once: every dup_every-th event is delivered twice
    deliveries = rows + [dict(r) for r in rows[::dup_every]]
    rng = random.Random(order_seed)
    rng.shuffle(deliveries)  # arrival order is arbitrary

    t = mk_table(spark, tmp_path_factory.mktemp("lww"), buckets=4)
    size = (len(deliveries) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = deliveries[b * size : (b + 1) * size]
        if chunk:
            merge_into(t, upd(spark, chunk), batch_id=b + 1)

    oracle = {}
    for r in rows:  # max-LSN per key; winning delete removes the key
        key = (r["repo"], r["path"])
        if key not in oracle or r["lsn"] > oracle[key][0]:
            oracle[key] = (r["lsn"], r["op"], r["content"])
    expected = {
        k: (lsn, content)
        for k, (lsn, op, content) in oracle.items()
        if op != "d"
    }
    assert live(t) == expected
