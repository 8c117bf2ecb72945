"""Lookback bin packing (reference pyiceberg/utils/bin_packing.py
ListPacker/PackingIterator semantics, re-derived): pack weighted items
into bins of ``target_weight``, keeping up to ``lookback`` bins open so
a small item can back-fill an earlier bin before new bins are opened.

Used by selective compaction (rewrite_data_files BinPack strategy): the
packer itself is driver-side — it packs FILE METADATA (one entry per
data file, the same cardinality the scan planner already holds), never
rows; the rewrite work it plans runs as Spark jobs."""

from __future__ import annotations

from typing import Callable, Generic, List, Sequence, TypeVar

T = TypeVar("T")


class ListPacker(Generic[T]):
    def __init__(self, target_weight: int, lookback: int = 10, largest_bin_first: bool = False):
        if target_weight <= 0:
            raise ValueError("target_weight must be positive")
        if lookback < 1:
            raise ValueError("lookback must be >= 1")
        self.target_weight = target_weight
        self.lookback = lookback
        self.largest_bin_first = largest_bin_first

    def pack(self, items: Sequence[T], weight_fn: Callable[[T], int]) -> List[List[T]]:
        closed: List[List[T]] = []
        open_bins: List[tuple[int, List[T]]] = []  # (current weight, items)
        for item in items:
            w = max(0, int(weight_fn(item)))
            placed = False
            for i, (bw, bin_items) in enumerate(open_bins):
                if bw + w <= self.target_weight:
                    bin_items.append(item)
                    open_bins[i] = (bw + w, bin_items)
                    placed = True
                    break
            if not placed:
                open_bins.append((w, [item]))
                if len(open_bins) > self.lookback:
                    closed.append(open_bins.pop(0)[1])
        remaining = [b for _, b in open_bins]
        if self.largest_bin_first:
            remaining.sort(key=lambda b: -sum(max(0, int(weight_fn(x))) for x in b))
        return closed + remaining
