"""Distributed Louvain (A12): clique fixtures + determinism + parity with
the driver-side networkx twin."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geograypher_spark.operators.community import louvain_distributed


def _clique_edges(nodes, w=1.0):
    return [(a, b, w) for i, a in enumerate(nodes) for b in nodes[i + 1:]]


def _ring_of_cliques(n_cliques=4, size=5, bridge_w=0.1):
    edges = []
    cliques = []
    for c in range(n_cliques):
        nodes = list(range(c * size, (c + 1) * size))
        cliques.append(nodes)
        edges += _clique_edges(nodes)
    for c in range(n_cliques):  # weak ring bridges
        edges.append((cliques[c][-1], cliques[(c + 1) % n_cliques][0], bridge_w))
    return edges, cliques


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long, weight double")


def test_ring_of_cliques_recovered(spark):
    edges, cliques = _ring_of_cliques()
    got = {r["node"]: r["community"]
           for r in louvain_distributed(_df(spark, edges)).collect()}
    for nodes in cliques:
        comms = {got[n] for n in nodes}
        assert len(comms) == 1, f"clique {nodes} split: {comms}"
        assert comms == {min(nodes)}  # canonical id = min member
    assert len(set(got.values())) == len(cliques)


def test_two_cliques_one_bridge(spark):
    edges = _clique_edges(list(range(6))) + \
        _clique_edges(list(range(6, 12))) + [(5, 6, 0.2)]
    got = {r["node"]: r["community"]
           for r in louvain_distributed(_df(spark, edges)).collect()}
    assert {got[n] for n in range(6)} == {0}
    assert {got[n] for n in range(6, 12)} == {6}


def test_deterministic_across_partitioning(spark):
    edges, _ = _ring_of_cliques(n_cliques=5, size=4)
    df1 = _df(spark, edges).repartition(1)
    df2 = _df(spark, edges).repartition(16)
    a = sorted((r["node"], r["community"])
               for r in louvain_distributed(df1).collect())
    b = sorted((r["node"], r["community"])
               for r in louvain_distributed(df2).collect())
    assert a == b


def test_matches_networkx_modularity_ballpark(spark):
    """Same partition quality as the reference's networkx Louvain on a
    structured graph (exact partition equality is not guaranteed by any
    Louvain variant — compare modularity)."""
    nx = pytest.importorskip("networkx")
    edges, _ = _ring_of_cliques(n_cliques=6, size=5, bridge_w=0.2)
    got = {r["node"]: r["community"]
           for r in louvain_distributed(_df(spark, edges)).collect()}
    g = nx.Graph()
    for a, b, w in edges:
        g.add_edge(a, b, weight=w)
    ours = {}
    for n, c in got.items():
        ours.setdefault(c, set()).add(n)
    q_ours = nx.community.modularity(g, list(ours.values()), weight="weight")
    ref = nx.community.louvain_communities(g, weight="weight", seed=1)
    q_ref = nx.community.modularity(g, ref, weight="weight")
    assert q_ours >= q_ref - 1e-9  # cliques: both find the optimum
