"""KLL-style mergeable quantile sketch for unbounded continuous columns.

The summarize() quantile modes each assume something about the data:
``nearest`` (value-keyed exact) assumes bounded value cardinality — a
truly continuous column makes its distinct-value window sort data-scale;
``approx`` (percentile_approx) has a single-threaded per-group final
digest merge that the builder's own profiling flagged (BENCH.md fix #1:
~accuracy samples per map partial, hundreds of partials, serial merge).
``quantile_mode="sketch"`` closes the gap with a Karnin–Lang–Liberty
compactor (arXiv:1603.05346): per-level buffers with geometrically
decaying capacities; a full level sorts, keeps alternating elements,
and promotes them one level up with doubled weight. Rank error is
O(1/k); state is O(k * log(n/k)) float64s.

Why it parallelizes where percentile_approx doesn't: phase 1 builds one
small sketch per (input-split, partition, column) inside ``mapInPandas``
— a true map-side combine over each Arrow batch — and phase 2 merges
the per-split sketches per (partition, column) group. A merge
concatenates level buffers and runs the same vectorized compaction, so
merging M partials is O(total buffered items), with the buffered total
capped by compaction at O(k log n) — versus percentile_approx's
O(M * accuracy) serial QuantileSummaries merge. Different (partition,
column) groups merge in parallel tasks, and each group's merge input is
M_splits sketches of a few hundred floats, not M_splits x accuracy
samples.

Determinism: the compaction coin is a per-level alternating toggle (the
classic derandomization), so the same input split the same way yields
the same sketch — tests pin exact quantile agreement within the rank
bound without seeding.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

import numpy as np

_CAP_DECAY = 2.0 / 3.0  # level-capacity decay c of the KLL paper
_MIN_CAP = 8


class KLLSketch:
    """Mergeable quantile sketch; level ``h`` items carry weight 2**h."""

    __slots__ = ("k", "n", "levels", "coins")

    def __init__(self, k: int = 200) -> None:
        self.k = int(k)
        self.n = 0  # non-null values observed (bookkeeping only)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.coins: list[int] = [0]

    # ------------------------------------------------------------ build

    def _cap(self, h: int) -> int:
        top = len(self.levels) - 1
        return max(_MIN_CAP, int(np.ceil(self.k * _CAP_DECAY ** (top - h))))

    def update_many(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.n += int(v.size)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.coins.append(0)
        for h, buf in enumerate(other.levels):
            if buf.size:
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self._compress()
        return self

    def _compress(self) -> None:
        while sum(b.size for b in self.levels) > sum(
            self._cap(h) for h in range(len(self.levels))
        ):
            for h in range(len(self.levels)):
                if self.levels[h].size > self._cap(h):
                    self._compact(h)
                    break
            else:
                return

    def _compact(self, h: int) -> None:
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.coins.append(0)
        buf = np.sort(self.levels[h])
        off = self.coins[h]
        self.coins[h] ^= 1
        self.levels[h] = np.empty(0, dtype=np.float64)
        promoted = buf[off::2]
        if promoted.size:
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # ------------------------------------------------------------ query

    def quantiles(self, qs: Sequence[float]) -> list[float]:
        """Nearest-rank quantiles over the weighted sample — the same
        round-half-up rank rule as the exact ``nearest`` mode, applied
        to sketch weights (so on an uncompacted sketch the answers are
        bit-identical to exact)."""
        sizes = [b.size for b in self.levels]
        if sum(sizes) == 0:
            return [float("nan") for _ in qs]
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(sz, 1 << h, dtype=np.int64) for h, sz in enumerate(sizes)]
        )
        order = np.argsort(vals, kind="stable")
        v, w = vals[order], wts[order]
        cum = np.cumsum(w)
        total = int(cum[-1])
        out = []
        for q in qs:
            target = int(np.floor(q * (total - 1) + 0.5)) + 1  # half-up rank
            idx = int(np.searchsorted(cum, target, side="left"))
            out.append(float(v[min(idx, v.size - 1)]))
        return out

    # -------------------------------------------------------- serialize

    def to_json(self) -> str:
        return json.dumps(
            {
                "k": self.k,
                "n": self.n,
                "coins": self.coins,
                "levels": [b.tolist() for b in self.levels],
            }
        )

    @classmethod
    def from_json(cls, blob: str) -> "KLLSketch":
        d = json.loads(blob)
        sk = cls(d["k"])
        sk.n = int(d["n"])
        sk.coins = [int(c) for c in d["coins"]]
        sk.levels = [np.asarray(b, dtype=np.float64) for b in d["levels"]]
        return sk


def kll_quantiles_from_pairs(
    pairs, keys: list[str], qs: tuple[float, ...], *, k: int = 200
):
    """Two-phase KLL quantiles over a (keys..., value) pair table:
    ``mapInPandas`` partial sketches per (input split, keys) — map-side
    combine, no raw-value shuffle — then a per-key ``applyInPandas``
    merge whose input is #splits sketch rows, not data. One output
    column ``_p{q*100}`` per requested quantile.

    The shuffle carries only sketch JSON (O(k log n) floats per split
    per key); at 10^12 rows with 10^5 splits and 10 columns that is
    ~10^6 metadata rows — the same scale shape as the moments sketches
    in sketches.py.
    """
    import pandas as pd
    from pyspark.sql import types as T

    fields = [pairs.schema[kcol] for kcol in keys]
    part_schema = T.StructType(
        list(fields) + [T.StructField("_sketch", T.StringType())]
    )

    def partials(batches):
        acc: dict[tuple, KLLSketch] = {}
        for pdf in batches:
            for keyvals, grp in pdf.groupby(keys, sort=False, dropna=False):
                if not isinstance(keyvals, tuple):
                    keyvals = (keyvals,)
                acc.setdefault(keyvals, KLLSketch(k)).update_many(
                    grp["value"].to_numpy(dtype=np.float64)
                )
        if acc:
            rows = [list(kv) + [sk.to_json()] for kv, sk in acc.items()]
            yield pd.DataFrame(rows, columns=keys + ["_sketch"])

    partial = pairs.mapInPandas(partials, part_schema)

    qcols = [f"_p{int(q * 100)}" for q in qs]
    out_schema = T.StructType(
        list(fields) + [T.StructField(c, T.DoubleType()) for c in qcols]
    )

    def merge_group(pdf):
        sk = KLLSketch(k)
        for blob in pdf["_sketch"]:
            sk.merge(KLLSketch.from_json(blob))
        row = [pdf[kcol].iloc[0] for kcol in keys] + sk.quantiles(qs)
        return pd.DataFrame([row], columns=keys + qcols)

    return partial.groupBy(*keys).applyInPandas(merge_group, out_schema)
