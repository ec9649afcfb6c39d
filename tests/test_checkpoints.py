"""Generation-scoped checkpoint manager: blocks are freed, frames stay
correct (checkpoints.py — the long-running-engine leak fix)."""

from proxyhouse_spark.checkpoints import (
    _persistent_ids,
    release_scope,
    scoped_checkpoint,
)


def _frame(spark, n):
    return spark.range(n).withColumnRenamed("id", "v")


def test_scope_holds_one_generation(spark):
    sc = spark.sparkContext
    base = _persistent_ids(sc)
    a = scoped_checkpoint(_frame(spark, 10), "t_scope")
    assert a.count() == 10
    after_a = _persistent_ids(sc) - base
    assert after_a  # the checkpoint registered blocks
    b = scoped_checkpoint(_frame(spark, 20), "t_scope")
    # generation a's RDDs are unpersisted: the live set minus base is
    # exactly generation b's ids (no accumulation across generations)
    after_b = _persistent_ids(sc) - base
    assert after_b.isdisjoint(after_a)
    assert b.count() == 20
    release_scope(spark, "t_scope")
    assert _persistent_ids(sc) - base == set()


def test_scopes_are_independent(spark):
    sc = spark.sparkContext
    base = _persistent_ids(sc)
    x = scoped_checkpoint(_frame(spark, 5), "t_x")
    y = scoped_checkpoint(_frame(spark, 7), "t_y")
    scoped_checkpoint(_frame(spark, 6), "t_x")  # frees x only
    assert y.count() == 7  # y's generation untouched
    release_scope(spark, "t_x")
    release_scope(spark, "t_y")
    assert _persistent_ids(sc) - base == set()


def test_release_unknown_scope_is_noop(spark):
    release_scope(spark, "never_created")
