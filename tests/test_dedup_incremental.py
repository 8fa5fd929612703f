"""Condensed seeded connected components (incremental cluster
maintenance) — constructed-graph cases the sf0.01 oracle data does not
exercise. In particular the MERGE case: at sf0.01 the driver corpus has
9 new-batch edges and ZERO that bridge two distinct old clusters
(measured), so `dedup_clusters_incremental` passing its full-rebuild
oracle there never proves the bridge logic. These tests pin it.
"""

from udacity_dend_capstone_immigration_spark.operators.dedup import (
    connected_components,
    incremental_components,
)


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "id_a long, id_b long")


def _assign(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def _rebuild(spark, all_edges, all_ids):
    return _assign(
        connected_components(_edges(spark, all_edges), _ids(spark, all_ids), id_col="doc_id")
    )


def test_new_doc_bridges_two_old_clusters(spark):
    # old graph: {1,2,3} (label 1) and {5,6} (label 5); new doc 70
    # bridges them via 70-2 and 70-6 → everything collapses to 1.
    old_edges = [(1, 2), (2, 3), (5, 6)]
    old_ids = [1, 2, 3, 5, 6]
    old = connected_components(_edges(spark, old_edges), _ids(spark, old_ids), id_col="doc_id")
    new_edges = [(70, 2), (70, 6)]
    got = _assign(
        incremental_components(old, _edges(spark, new_edges), _ids(spark, [70]), id_col="doc_id")
    )
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 6: 1, 70: 1}
    # bit-identical to the full rebuild on the union graph
    assert got == _rebuild(spark, old_edges + new_edges, old_ids + [70])


def test_chain_of_new_docs_merges_three_old_clusters(spark):
    # three old clusters bridged only THROUGH new docs (21-14-28 chain):
    # propagation must traverse multiple meta-hops, not one.
    old_edges = [(1, 2), (5, 6), (9, 10)]
    old_ids = [1, 2, 5, 6, 9, 10]
    old = connected_components(_edges(spark, old_edges), _ids(spark, old_ids), id_col="doc_id")
    new_edges = [(21, 2), (21, 14), (14, 28), (28, 6), (28, 9)]
    new_ids = [21, 14, 28]
    got = _assign(
        incremental_components(old, _edges(spark, new_edges), _ids(spark, new_ids), id_col="doc_id")
    )
    assert set(got.values()) == {1}
    assert got == _rebuild(spark, old_edges + new_edges, old_ids + new_ids)


def test_new_singletons_and_untouched_old_clusters_pass_through(spark):
    # an edge-less new doc stays its own cluster; an old cluster with no
    # new edges keeps its label; a new-new pair clusters to its min.
    old_edges = [(1, 2), (5, 6)]
    old_ids = [1, 2, 5, 6]
    old = connected_components(_edges(spark, old_edges), _ids(spark, old_ids), id_col="doc_id")
    new_edges = [(14, 21)]
    new_ids = [14, 21, 35]
    got = _assign(
        incremental_components(old, _edges(spark, new_edges), _ids(spark, new_ids), id_col="doc_id")
    )
    assert got == {1: 1, 2: 1, 5: 5, 6: 5, 14: 14, 21: 14, 35: 35}
    assert got == _rebuild(spark, old_edges + new_edges, old_ids + new_ids)


def test_new_label_can_become_the_representative(spark):
    # a new doc with a SMALLER id than the old representative must win
    # the min-label (cluster ids are min member ids, not "old wins").
    old_edges = [(5, 6)]
    old_ids = [5, 6]
    old = connected_components(_edges(spark, old_edges), _ids(spark, old_ids), id_col="doc_id")
    got = _assign(
        incremental_components(old, _edges(spark, [(0, 6)]), _ids(spark, [0]), id_col="doc_id")
    )
    assert got == {0: 0, 5: 0, 6: 0}
    assert got == _rebuild(spark, [(5, 6), (0, 6)], [5, 6, 0])


# --- delete-side (delete_from_components): splits and relabels the
# propagation-based paths cannot express.

from udacity_dend_capstone_immigration_spark.operators.dedup import (  # noqa: E402
    delete_from_components,
)


def test_deleting_cut_vertex_splits_cluster(spark):
    # path 1-2-3: deleting the middle doc splits {1,2,3} into {1},{3}
    edges = [(1, 2), (2, 3), (5, 6)]
    ids = [1, 2, 3, 5, 6]
    assign = connected_components(_edges(spark, edges), _ids(spark, ids), id_col="doc_id")
    got = _assign(
        delete_from_components(assign, _edges(spark, edges), _ids(spark, [2]), id_col="doc_id")
    )
    assert got == {1: 1, 3: 3, 5: 5, 6: 5}
    assert got == _rebuild(spark, [(5, 6)], [1, 3, 5, 6])


def test_deleting_representative_relabels_survivors(spark):
    # 1 is the min label of {1,2,3}; deleting it relabels to 2
    edges = [(1, 2), (2, 3), (1, 3)]
    assign = connected_components(_edges(spark, edges), _ids(spark, [1, 2, 3]), id_col="doc_id")
    got = _assign(
        delete_from_components(assign, _edges(spark, edges), _ids(spark, [1]), id_col="doc_id")
    )
    assert got == {2: 2, 3: 2}
    assert got == _rebuild(spark, [(2, 3)], [2, 3])


def test_untouched_clusters_pass_through_delete(spark):
    # deleting a singleton leaves other clusters' rows untouched
    edges = [(1, 2)]
    ids = [1, 2, 9]
    assign = connected_components(_edges(spark, edges), _ids(spark, ids), id_col="doc_id")
    got = _assign(
        delete_from_components(assign, _edges(spark, edges), _ids(spark, [9]), id_col="doc_id")
    )
    assert got == {1: 1, 2: 1}
    assert got == _rebuild(spark, edges, [1, 2])


def test_delete_whole_cluster_leaves_no_orphans(spark):
    edges = [(1, 2), (5, 6)]
    ids = [1, 2, 5, 6]
    assign = connected_components(_edges(spark, edges), _ids(spark, ids), id_col="doc_id")
    got = _assign(
        delete_from_components(assign, _edges(spark, edges), _ids(spark, [1, 2]), id_col="doc_id")
    )
    assert got == {5: 5, 6: 5}
    assert got == _rebuild(spark, [(5, 6)], [5, 6])
