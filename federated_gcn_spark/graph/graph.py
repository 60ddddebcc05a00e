"""Graph abstraction: a pair of DataFrames (vertices, edges).

The reference's graph object is ``sg.StellarGraph(nodes, edges)``
(models/supervised.py:65, models/unsupervised.py:48) — homogeneous, one
node type, one edge type, features on vertices. Here a Graph is just two
DataFrames plus relational algorithms over them; construction *is* the
integrity join (SURVEY.md §2.3 J1), message passing *is* edges⋈features
(J2), and everything stays inside Catalyst.

Conventions: vertices carry ``id`` (+ arbitrary attribute columns, e.g.
``features ARRAY<FLOAT>``); edges carry ``src, dst`` (+ attributes).
Edges are stored directed; undirected algorithms symmetrize explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ID, SRC, DST = "id", "src", "dst"


class Graph:
    def __init__(self, vertices: DataFrame, edges: DataFrame):
        if ID not in vertices.columns:
            raise ValueError(f"vertices must have an '{ID}' column")
        if SRC not in edges.columns or DST not in edges.columns:
            raise ValueError(f"edges must have '{SRC}' and '{DST}' columns")
        self.vertices = vertices
        self.edges = edges

    # -- construction -------------------------------------------------------

    @staticmethod
    def from_edges(edges: DataFrame) -> "Graph":
        """Derive the vertex set from the edge list (P7;
        models/unsupervised.py:49 ``list(graph.nodes())``)."""
        vertices = (
            edges.select(F.col(SRC).alias(ID))
            .unionAll(edges.select(F.col(DST).alias(ID)))
            .distinct()
        )
        return Graph(vertices, edges)

    def validated(self) -> "Graph":
        """Keep only edges whose endpoints both resolve to a vertex row —
        StellarGraph's construction-time integrity check (J1) as two
        broadcast-able semi joins (no data movement of edge payloads
        beyond the shuffle on the join keys)."""
        v = self.vertices.select(ID)
        edges = (
            self.edges.join(v.withColumnRenamed(ID, SRC), SRC, "left_semi")
            .join(v.withColumnRenamed(ID, DST), DST, "left_semi")
        )
        return Graph(self.vertices, edges)

    def dangling_edges(self) -> DataFrame:
        """Edges referencing a missing endpoint (the rows validated() drops)."""
        v = self.vertices.select(ID)
        e = self.edges
        return e.join(v.withColumnRenamed(ID, SRC), SRC, "left_anti").unionByName(
            e.join(v.withColumnRenamed(ID, DST), DST, "left_anti")
        ).distinct()

    # -- basic topology -----------------------------------------------------

    def symmetrized_edges(self) -> DataFrame:
        """src↔dst union for undirected semantics (the reference's graphs
        are undirected-in-spirit, stored one row per edge — SURVEY.md §1.1)."""
        e = self.edges.select(SRC, DST)
        return e.unionAll(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))

    def degrees(self) -> DataFrame:
        """Undirected degree per vertex (map-side combinable count)."""
        return (
            self.symmetrized_edges()
            .groupBy(F.col(SRC).alias(ID))
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col(SRC).alias(ID)).agg(
            F.count(F.lit(1)).alias("out_degree")
        )

    def neighbors(self, frontier: DataFrame, undirected: bool = True) -> DataFrame:
        """One-hop expansion: frontier(id, ...) ⋈ edges → (id, neighbor).

        The J2 primitive: GraphSAGE layer-k gathering is this join iterated
        per layer. Broadcast the frontier when it is small (Catalyst/AQE
        decide via size estimate).
        """
        e = self.symmetrized_edges() if undirected else self.edges.select(SRC, DST)
        return frontier.join(e, frontier[ID] == e[SRC]).select(
            frontier[ID], F.col(DST).alias("neighbor")
        )

    def aggregate_messages(
        self,
        msg: Column,
        agg: Column,
        direction: str = "dst",
    ) -> DataFrame:
        """GraphFrames-style aggregateMessages: evaluate ``msg`` on each
        (edge ⋈ src-attrs ⋈ dst-attrs) row, aggregate per ``direction``
        vertex. The building block for mean-aggregator message passing (G4).

        ``msg`` may reference columns of edges plus ``src_<attr>`` /
        ``dst_<attr>`` vertex attributes; ``agg`` is an aggregate over
        ``_msg`` (e.g. ``F.avg("_msg")``).
        """
        src_attrs = self.vertices.select(
            [F.col(c).alias(SRC if c == ID else f"src_{c}") for c in self.vertices.columns]
        )
        dst_attrs = self.vertices.select(
            [F.col(c).alias(DST if c == ID else f"dst_{c}") for c in self.vertices.columns]
        )
        triplets = self.edges.join(src_attrs, SRC).join(dst_attrs, DST)
        key = SRC if direction == "src" else DST
        return (
            triplets.withColumn("_msg", msg)
            .groupBy(F.col(key).alias(ID))
            .agg(agg.alias("agg"))
        )

    # -- stats --------------------------------------------------------------

    def num_vertices(self) -> int:
        return self.vertices.count()

    def num_edges(self) -> int:
        return self.edges.count()
