"""Host-graph PageRank (pipelines/graphrank.py)."""

import numpy as np
import pandas as pd

from gruut_ray.pipelines.graphrank import (_host_of, host_link_edges,
                                           host_pagerank,
                                           pagerank_from_edges)


def test_host_of():
    assert _host_of("https://A.Example:8080/x") == "a.example"
    assert _host_of("http://u@b.example/p") == "b.example"
    assert _host_of("garbage") == ""


def test_pagerank_known_graph():
    # triangle a->b, b->c, c->a : symmetric, rank = 1/3 each
    edges = pd.DataFrame({"src": ["a", "b", "c"],
                          "dst": ["b", "c", "a"], "n": [1, 1, 1]})
    r = pagerank_from_edges(edges, iters=100)
    assert np.allclose(r["rank"], 1 / 3, atol=1e-9)
    # hub: everyone links to z -> z dominates
    edges = pd.DataFrame({"src": ["a", "b", "c"],
                          "dst": ["z", "z", "z"], "n": [1, 1, 1]})
    r = pagerank_from_edges(edges, iters=100).set_index("host")["rank"]
    assert r["z"] > r["a"] and abs(r.sum() - 1.0) < 1e-9


def test_pagerank_dangling_mass_conserved():
    # b has no outlinks: its mass must redistribute, ranks still sum to 1
    edges = pd.DataFrame({"src": ["a"], "dst": ["b"], "n": [3]})
    r = pagerank_from_edges(edges, iters=80)
    assert abs(r["rank"].sum() - 1.0) < 1e-9
    assert r.set_index("host")["rank"]["b"] > 0.5


def test_host_pagerank_over_synth_pages(ray_session):
    from gruut_ray.sources.synth import synth_dataset

    pages = synth_dataset(2000)
    edges = host_link_edges(pages)
    assert len(edges) > 100  # cross-host links exist
    assert (edges["src"] != edges["dst"]).all()

    out = host_pagerank(pages, iters=15, top_k=10)
    assert len(out) == 10
    # quadratic target skew: low-numbered sites collect the inlinks
    top_sites = [int(h.replace("site", "").replace(".example", ""))
                 for h in out["host"]]
    assert np.median(top_sites) < 100, top_sites
    assert (out["rank_ppm"].to_numpy()[:-1]
            >= out["rank_ppm"].to_numpy()[1:]).all()


def test_distributed_path_matches_driver_path(ray_session):
    from gruut_ray.sources.synth import synth_dataset

    pages = synth_dataset(800)
    drv = host_pagerank(pages, iters=10, top_k=15)
    dist = host_pagerank(pages, iters=10, top_k=15,
                         driver_edge_limit=0)
    pd.testing.assert_frame_equal(drv, dist)


def test_keyed_join_path_matches_driver_path(ray_session):
    """VERDICT r04 #7: past host_broadcast_limit the rank vector is a
    Dataset and each iteration is a keyed join — forced here with
    limit 0 so the synthetic graph crosses the cut-over; ranks must
    match the driver power iteration on the same edges."""
    from gruut_ray.sources.synth import synth_dataset

    pages = synth_dataset(400)
    drv = host_pagerank(pages, iters=5, top_k=15)
    joined = host_pagerank(pages, iters=5, top_k=15,
                           driver_edge_limit=0, host_broadcast_limit=0,
                           join_partitions=4)
    pd.testing.assert_frame_equal(drv, joined)


def test_pagerank_edges_ds_known_graphs(ray_session):
    """Dataset-native iteration reproduces the reference power
    iteration exactly on hand-checked graphs (incl. dangling mass)."""
    import pyarrow as pa
    import ray.data

    from gruut_ray.pipelines.graphrank import pagerank_edges_ds

    for edges in (
        pd.DataFrame({"src": ["a"], "dst": ["b"], "n": [3]}),
        pd.DataFrame({"src": ["a", "a", "b"], "dst": ["b", "c", "c"],
                      "n": [2, 1, 5]}),
    ):
        want = pagerank_from_edges(edges, iters=6, tol=0.0) \
            .sort_values("host").reset_index(drop=True)
        eds = ray.data.from_arrow(pa.Table.from_pandas(
            edges, preserve_index=False)).repartition(2)
        got = (pagerank_edges_ds(eds, iters=6, num_partitions=2)
               .to_pandas().sort_values("host").reset_index(drop=True))
        assert abs(got["rank"].sum() - 1.0) < 1e-9
        pd.testing.assert_frame_equal(got, want, atol=1e-12, rtol=0)


def test_bfs_depth_histogram_synthetic(ray_session):
    import ray.data

    from gruut_ray.pipelines.graphrank import bfs_depth_histogram

    # Orders o1..o3 link cust 1 -> parts {10, 11}; cust 2 -> part 11;
    # cust 3's only lineitem is below min_qty -> unreachable.
    orders = pd.DataFrame({"o_orderkey": [1, 2, 3],
                           "o_custkey": [1, 2, 3]})
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3],
        "l_partkey": [10, 11, 11, 12],
        "l_quantity": [50.0, 50.0, 50.0, 1.0],
    })
    got = bfs_depth_histogram(
        ray.data.from_pandas(orders).repartition(2),
        ray.data.from_pandas(li).repartition(2),
        min_qty=45, max_depth=8, num_partitions=2)
    # seed = cust1 (node 2); depth1 = parts 10,11 (nodes 21,23);
    # depth2 = cust2 (node 4); BFS exhausts at depth 2 (< max_depth);
    # cust3/part12 never appear.
    assert got["depth"].tolist() == [0, 1, 2]
    assert got["n"].tolist() == [1, 2, 1]
    assert got["s"].tolist() == [2, 44, 4]


def test_bfs_dataset_native_path_identity(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from gruut_ray.pipelines.graphrank import bfs_depth_histogram

    d = "/root/testdata/sf0.001"
    orders = ray.data.read_parquet(
        f"{d}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = ray.data.read_parquet(
        f"{d}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"])
    broadcast = bfs_depth_histogram(orders, li, num_partitions=4)
    ds_native = bfs_depth_histogram(orders, li, num_partitions=4,
                                    force_ds=True)
    pd.testing.assert_frame_equal(broadcast, ds_native)
    assert len(broadcast) >= 3  # real depth spread at sf0.001
