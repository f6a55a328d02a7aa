"""Per-point coordinate-operation selection.

Semantics per /root/reference/src/4D_api.cpp:204-376
(pj_get_suggested_operation + the alternativeCoordinateOperations
dispatch in proj_trans): a transformation object may carry several
candidate operations, each with a source/destination bounding box, an
accuracy figure (−1 = unknown) and an offshore flag. Per point:

1. choose the first bbox-matching candidate, then replace it by any
   later bbox-matching candidate with known, strictly better accuracy
   that is not offshore (4D_api.cpp:214-252);
2. apply it; points that come back poisoned (HUGE_VAL) exclude that
   candidate and retry selection, at most N_MAX_RETRY=2 exclusions
   per point (4D_api.cpp:269-323);
3. points with no usable candidate fall back to the first grid-free
   operation (4D_api.cpp:325-362); if none exists the point errors.

The engine vectorizes this as masked passes: selection is an O(n_ops)
sweep of bbox masks, execution groups points by selected operation so
each candidate's kernel runs once per batch per retry round — the Ray
Data idiom for "pick a different pipeline per row" without any
per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .errors import ERR_INVALID_ARG, ProjError
from .op import FWD, Coords, Operation

N_MAX_RETRY = 2


@dataclass
class AltOperation:
    """One candidate operation (CoordOperation in 4D_api.cpp)."""

    op: Operation
    name: str = ""
    # source/destination areas of use (radians for geographic ends)
    minx_src: float = -np.inf
    miny_src: float = -np.inf
    maxx_src: float = np.inf
    maxy_src: float = np.inf
    minx_dst: float = -np.inf
    miny_dst: float = -np.inf
    maxx_dst: float = np.inf
    maxy_dst: float = np.inf
    accuracy: float = -1.0
    is_offshore: bool = False
    needs_grids: bool = False

    def bbox_mask(self, direction: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        if direction == FWD:
            return (
                (x >= self.minx_src) & (y >= self.miny_src)
                & (x <= self.maxx_src) & (y <= self.maxy_src)
            )
        return (
            (x >= self.minx_dst) & (y >= self.miny_dst)
            & (x <= self.maxx_dst) & (y <= self.maxy_dst)
        )


def suggest_operations(alts: list[AltOperation], direction: int,
                       x: np.ndarray, y: np.ndarray,
                       excluded: np.ndarray | None = None) -> np.ndarray:
    """Vectorized pj_get_suggested_operation: returns the chosen
    candidate index per point (−1 = none). ``excluded`` is an
    (n, N_MAX_RETRY) int array of per-point excluded indices."""
    n = len(x)
    best = np.full(n, -1, dtype=np.int64)
    bestacc = np.full(n, np.finfo(np.float64).max)
    for i, alt in enumerate(alts):
        ok = alt.bbox_mask(direction, x, y)
        if excluded is not None:
            ok &= (excluded != i).all(axis=1)
        take = ok & (
            (best < 0)
            | ((alt.accuracy >= 0) & (alt.accuracy < bestacc) & (not alt.is_offshore))
        )
        if take.any():
            best[take] = i
            bestacc[take] = alt.accuracy
    return best


class RoutedOperation(Operation):
    """Operation whose trans() routes each point to the best candidate
    (the engine's equivalent of a PJ with
    alternativeCoordinateOperations)."""

    name = "routed"
    need_ellps = False

    def __init__(self, alts: list[AltOperation]):
        if not alts:
            raise ProjError(ERR_INVALID_ARG, "routed: empty operation list")
        self.alts = alts
        self.inverted = False
        self.parent = None

    @property
    def has_inverse(self) -> bool:
        return all(a.op.has_inverse for a in self.alts)

    def angular_input(self, direction: int) -> bool:
        return self.alts[0].op.angular_input(direction)

    def angular_output(self, direction: int) -> bool:
        return self.alts[0].op.angular_output(direction)

    def degree_input(self, direction: int) -> bool:
        return self.alts[0].op.degree_input(direction)

    def degree_output(self, direction: int) -> bool:
        return self.alts[0].op.degree_output(direction)

    def trans(self, direction: int, coo: Coords) -> Coords:
        if self.inverted:
            direction = -direction
        n = len(coo)
        excluded = np.full((n, N_MAX_RETRY), -1, dtype=np.int64)
        pending = np.ones(n, dtype=bool)
        chosen = np.full(n, -1, dtype=np.int64)
        for retry in range(N_MAX_RETRY + 1):
            if not pending.any():
                break
            idx = np.nonzero(pending)[0]
            best = suggest_operations(
                self.alts, direction, coo.x[idx], coo.y[idx], excluded[idx]
            )
            chosen[idx] = best
            none_left = idx[best < 0]
            pending[none_left] = False  # go to grid-free fallback
            for i in np.unique(best[best >= 0]):
                sel = idx[best == i]
                sub = Coords(coo.x[sel], coo.y[sel], coo.z[sel], coo.t[sel])
                self.alts[i].op.trans(direction, sub)
                good = np.isfinite(sub.x)
                ok_sel = sel[good]
                coo.x[ok_sel] = sub.x[good]
                coo.y[ok_sel] = sub.y[good]
                coo.z[ok_sel] = sub.z[good]
                coo.t[ok_sel] = sub.t[good]
                pending[ok_sel] = False
                if retry < N_MAX_RETRY:
                    bad_sel = sel[~good]
                    excluded[bad_sel, retry] = i
                else:
                    pending[sel[~good]] = False
                    chosen[sel[~good]] = -1
        # grid-free fallback (4D_api.cpp:325-362)
        fallback = (chosen < 0)
        if fallback.any():
            fb = next((i for i, a in enumerate(self.alts) if not a.needs_grids), None)
            if fb is None:
                coo.set_err(fallback, ERR_INVALID_ARG)
                coo.poison_errors()
            else:
                sel = np.nonzero(fallback)[0]
                sub = Coords(coo.x[sel], coo.y[sel], coo.z[sel], coo.t[sel])
                self.alts[fb].op.trans(direction, sub)
                coo.x[sel] = sub.x
                coo.y[sel] = sub.y
                coo.z[sel] = sub.z
                coo.t[sel] = sub.t
                coo.err[sel] = sub.err
                chosen[sel] = fb
        self.last_chosen = chosen  # exposed for routing queries/tests
        return coo

    def fwd(self, coo: Coords) -> Coords:
        return self.trans(FWD, coo)

    def inv(self, coo: Coords) -> Coords:
        from .op import INV

        return self.trans(INV, coo)
