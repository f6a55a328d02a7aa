"""gie conformance-DSL runner.

Parses and executes the reference's .gie test scripts
(verbs and check semantics per /root/reference/src/apps/gie.cpp:
operation/accept/expect/roundtrip/direction/tolerance/ignore/
require_grid/skip; expect check at :906-1040). Each operation's
assertions run through our vectorized engine one coordinate at a time
(batch size 1 — the engine is batch-native, gie is per-point).

Check metric: geodesic distance for angular output, euclidean
otherwise (gie.cpp:1018-1021); pass iff d <= tolerance (default
0.5 mm, reset per operation, gie.cpp:600).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np

from ..core import errors as E
from ..core.constants import DEG_TO_RAD
from ..core.dms import dms_to_rad
from ..core.errors import ProjError
from ..core.op import FWD, INV, Coords, Operation
from ..mathx import adjlon

GRS80_DEG = 111319.4908  # deg-to-m at the GRS80 equator (gie.cpp:467)

_ERRNO_BY_NAME: dict[str, int] = {
    "pjd_err_" + k[4:].lower(): v
    for k, v in vars(E).items()
    if k.startswith("ERR_") and isinstance(v, int)
}

_TAGS = (
    "operation",
    "accept",
    "expect",
    "roundtrip",
    "banner",
    "verbose",
    "direction",
    "tolerance",
    "ignore",
    "require_grid",
    "echo",
    "skip",
    "crs_src",
    "crs_dst",
    "use_proj4_init_rules",
)


def errno_from_name(s: str) -> int:
    s = s.strip().lower()
    try:
        return int(s)
    except ValueError:
        if not s.startswith("pjd_err_"):
            s = "pjd_err_" + s
        if s in _ERRNO_BY_NAME:
            return _ERRNO_BY_NAME[s]
        # tolerate abbreviated names (missing_arg → missing_args, …)
        matches = {v for k, v in _ERRNO_BY_NAME.items() if k.startswith(s)}
        if len(matches) == 1:
            return matches.pop()
        if s == "pjd_err_generic":
            # 'expect failure errno generic error' (4D-API:525) — any
            # creation error satisfies it
            return 0
        return 9999


def _strtod_scaled(args: str, default_scale: float = 1.0) -> float:
    """'0.1 mm' → meters (gie.cpp strtod_scaled)."""
    m = re.match(r"\s*([-+0-9.eE]+)\s*([a-z]*)", args)
    if not m or not m.group(1):
        return math.inf
    try:
        s = float(m.group(1))
    except ValueError:
        return math.inf
    unit = m.group(2)
    scale = {
        "km": 1000.0,
        "m": 1.0,
        "dm": 0.1,
        "cm": 0.01,
        "mm": 1e-3,
        "um": 1e-6,
        "nm": 1e-9,
    }.get(unit)
    if scale is not None:
        return s * scale
    if unit == "rad":
        return GRS80_DEG * math.degrees(s)
    if unit == "deg":
        return GRS80_DEG * s
    return s * default_scale


_NUMLIKE = re.compile(r"[-+0-9.]")


def parse_coord(args: str) -> tuple[list[float], int]:
    """Parse up to 4 coordinate values (decimal or DMS). Returns
    (4-vector defaulted to 0, dimensions_given)."""
    v = [0.0, 0.0, 0.0, 0.0]
    toks = args.split()
    dims = 0
    for tok in toks[:4]:
        if not _NUMLIKE.match(tok):
            break
        if any(c in tok for c in "d'\"NSEW") and not tok.lstrip("+-").replace(".", "").isdigit():
            # DMS notation: parse to radians then express in degrees
            # (gie stores raw degrees; conversion to radians happens later)
            v[dims] = dms_to_rad(tok) / DEG_TO_RAD
        else:
            try:
                v[dims] = float(tok)
            except ValueError:
                break
        dims += 1
    return v, dims


def lp_dist(ell, lam1, phi1, lam2, phi2) -> float:
    """Geodesic distance between two nearly-coincident points,
    local-curvature approximation (exact geod_inverse reduces to this
    for small separations; error O(d³/R²) ≪ any gie tolerance)."""
    if not (math.isfinite(lam1) and math.isfinite(lam2)):
        return math.inf
    dphi = phi2 - phi1
    dlam = float(adjlon(np.array([lam2 - lam1]))[0])
    phim = 0.5 * (phi1 + phi2)
    s2 = math.sin(phim) ** 2
    tmp = 1.0 - ell.es * s2
    m = ell.a * (1 - ell.es) / (tmp * math.sqrt(tmp))
    n = ell.a / math.sqrt(tmp)
    return math.hypot(m * dphi, n * math.cos(phim) * dlam)


@dataclass
class GieFailure:
    file: str
    lineno: int
    operation: str
    direction: str
    accept: list[float]
    expect: str
    got: list[float] | None
    deviation: float | None


@dataclass
class GieResult:
    total: int = 0
    ok: int = 0
    skipped: int = 0
    failed: int = 0
    failures: list[GieFailure] = field(default_factory=list)
    skipped_ops: set = field(default_factory=set)

    def merge(self, other: "GieResult") -> None:
        self.total += other.total
        self.ok += other.ok
        self.skipped += other.skipped
        self.failed += other.failed
        self.failures.extend(other.failures)
        self.skipped_ops |= other.skipped_ops


def _records(path: str):
    """Yield (tag, args, lineno) records; a record's args may span lines
    until the next tag / decorative line (gie.cpp ffio semantics).
    Content outside <gie>/<gie-strict> … </gie…> blocks is commentary."""
    with open(path, errors="replace") as f:
        text = f.read()
    has_markers = "<gie" in text
    in_block = not has_markers
    tag = None
    args: list[str] = []
    start_line = 0
    for lineno, raw in enumerate(text.splitlines(), 1):
        line = raw.split("#", 1)[0].rstrip()
        line = line.rstrip("\\").strip()
        if not line:
            continue
        if line.startswith("<gie"):
            in_block = True
            continue
        if line.startswith("</gie"):
            if tag:
                yield tag, " ".join(args), start_line
                tag = None
            in_block = False
            continue
        if not in_block:
            continue
        if line.startswith(("---", "===")):
            if tag:
                yield tag, " ".join(args), start_line
                tag = None
            continue
        word = line.split(None, 1)[0]
        if word in _TAGS:
            if tag:
                yield tag, " ".join(args), start_line
            tag = word
            args = [line[len(word):].strip()]
            start_line = lineno
        elif tag:
            args.append(line)
    if tag:
        yield tag, " ".join(args), start_line


def _normalize_projstring(s: str) -> str:
    """gie free formatting → canonical '+key=value' tokens:
    collapse spaces around '=' and after ','; drop ';' separators."""
    s = s.replace(";", " ")
    s = re.sub(r"\s*=\s*", "=", s)
    s = re.sub(r",\s+", ",", s)
    return s


class _OpState:
    def __init__(self):
        self.op: Operation | None = None
        self.op_error: int | None = None
        self.operation_str = ""
        self.direction = FWD
        self.tolerance = 0.0005
        self.ignore = 9999
        self.skip_test = False
        self.accept: list[float] = [0.0, 0.0, 0.0, 0.0]
        self.dims_at_accept = 2
        # deferred roundtrip directives, flushed batched per operation
        self.pending_roundtrips: list = []


def _scan_inline_inits(path: str) -> dict[str, list[tuple[str, str | None]]]:
    """GIGS-style gie files document their EPSG codes as init-file
    sections '<NNNN> defn <>' at the top — parse them so +init=epsg:NNNN
    resolves without the EPSG database."""
    from ..core.params import Params

    sections: dict[str, list[tuple[str, str | None]]] = {}
    with open(path, errors="replace") as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            m = re.match(r"<(\w+)>\s*(.*?)\s*<>\s*$", line)
            if m and not m.group(1).startswith("gie"):
                sections[m.group(1)] = Params.parse(m.group(2)).pairs
    return sections


def run_gie_file(
    path: str,
    create_operation,
    grid_available=None,
    unsupported_as_skip: bool = True,
) -> GieResult:
    """Run one .gie file. ``create_operation`` is the factory;
    ``grid_available(name) -> bool`` gates require_grid blocks."""
    from ..core import resources

    inline = _scan_inline_inits(path)
    if inline:
        resources.set_catalog_override("epsg", inline)
    try:
        return _run_gie_file_inner(path, create_operation, grid_available, unsupported_as_skip)
    finally:
        if inline:
            resources.clear_catalog_override("epsg")


def _run_gie_file_inner(
    path: str,
    create_operation,
    grid_available=None,
    unsupported_as_skip: bool = True,
) -> GieResult:
    res = GieResult()
    st = _OpState()

    for tag, args, lineno in _records(path):
        if tag == "operation":
            _flush_roundtrips(res, st, path)
            st = _OpState()
            st.operation_str = _normalize_projstring(args)
            try:
                if "proj=" not in st.operation_str and (
                    ":" in st.operation_str or "[" in st.operation_str
                ):
                    # genuinely CRS-style definition (WKT body or an
                    # authority:code): requires ISO-19111 — out of scope
                    raise NotImplementedError("non-proj-string definition")
                if "proj=" not in st.operation_str and "=" not in st.operation_str:
                    # bogus/empty text: the reference routes these to
                    # createFromUserInput, which throws → 'generic
                    # error' (-61) from proj_create (4D-API:522-525)
                    raise ProjError(-61, st.operation_str[:60])
                st.op = create_operation(st.operation_str)
                st.op_error = None
            except ProjError as e:
                st.op = None
                if e.code == E.ERR_UNKNOWN_PROJECTION_ID and unsupported_as_skip:
                    st.op_error = None  # operator not implemented yet → skip
                    st.skip_test = True
                    res.skipped_ops.add(st.operation_str)
                else:
                    st.op_error = e.code
            except NotImplementedError:
                st.op = None
                st.op_error = None  # unsupported operator
                st.skip_test = unsupported_as_skip
                res.skipped_ops.add(st.operation_str)
            except Exception:
                st.op = None
                st.op_error = E.ERR_GENERIC_ERROR
        elif tag == "direction":
            st.direction = INV if args.strip()[:1].lower() in ("i", "r") else FWD
        elif tag == "tolerance":
            st.tolerance = _strtod_scaled(args, 1.0)
            if math.isinf(st.tolerance):
                st.tolerance = 0.0005
        elif tag == "ignore":
            st.ignore = errno_from_name(args.split()[0]) if args.split() else 9999
        elif tag == "require_grid":
            name = args.split()[0] if args.split() else ""
            if grid_available is None:
                from ..core.resources import find_file

                if find_file(name) is None:
                    st.skip_test = True
            elif not grid_available(name):
                st.skip_test = True
        elif tag == "accept":
            st.accept, dims = parse_coord(args)
            st.dims_at_accept = dims
        elif tag == "expect":
            res.total += 1
            if st.skip_test:
                res.skipped += 1
                continue
            _run_expect(res, st, args, path, lineno)
        elif tag == "roundtrip":
            if st.skip_test or st.op is None:
                continue
            st.pending_roundtrips.append(
                (args, lineno, list(st.accept), st.direction, st.tolerance)
            )
        # banner/verbose/echo/skip/crs_*: ignored

    _flush_roundtrips(res, st, path)
    return res


def _to_coords(st: _OpState, vals: list[float], direction: int) -> Coords:
    v = list(vals)
    if st.op.angular_input(direction):
        axis = "enut"
        ax_param = st.op.params.str_("axis")
        if ax_param and direction == INV:
            axis = ax_param
        for i, a in enumerate(axis[:4]):
            if a in "news":
                v[i] = math.radians(v[i])
    return Coords(
        np.array([v[0]]), np.array([v[1]]), np.array([v[2]]), np.array([v[3]])
    )


def _expected_rad(st: _OpState, vals: list[float], direction: int) -> list[float]:
    v = list(vals)
    if st.op.angular_output(direction):
        axis = "enut"
        ax_param = st.op.params.str_("axis")
        if ax_param and direction == FWD:
            axis = ax_param
        for i, a in enumerate(axis[:4]):
            if a in "news":
                v[i] = math.radians(v[i])
    return v


def _run_expect(res: GieResult, st: _OpState, args: str, path: str, lineno: int) -> None:
    expect_failure = args.startswith("failure")
    expect_errno = 0
    if expect_failure:
        cols = args.split()
        if len(cols) >= 3 and cols[1] == "errno":
            expect_errno = errno_from_name(cols[2])

    if st.op is None:
        if st.op_error is not None and st.op_error == st.ignore:
            res.skipped += 1
            return
        if st.op_error is None:  # unsupported operator
            res.skipped += 1
            res.skipped_ops.add(st.operation_str)
            return
        if expect_failure:
            if expect_errno and st.op_error != expect_errno:
                res.failed += 1
                res.failures.append(
                    GieFailure(path, lineno, st.operation_str, "create", st.accept,
                               args, None, None)
                )
                return
            res.ok += 1
            return
        res.failed += 1
        res.failures.append(
            GieFailure(path, lineno, st.operation_str, "create", st.accept, args, None, None)
        )
        return

    coo = _to_coords(st, st.accept, st.direction)
    try:
        st.op.trans(st.direction, coo)
    except NotImplementedError:
        res.skipped += 1
        res.skipped_ops.add(st.operation_str)
        return

    if expect_failure:
        bad = not math.isfinite(coo.x[0])
        if expect_errno:
            if int(coo.err[0]) == expect_errno:
                res.ok += 1
            else:
                res.failed += 1
                res.failures.append(
                    GieFailure(path, lineno, st.operation_str,
                               "fwd" if st.direction == FWD else "inv",
                               st.accept, args, [coo.x[0], coo.y[0], int(coo.err[0])], None)
                )
        elif bad:
            res.ok += 1
        else:
            res.failed += 1
            res.failures.append(
                GieFailure(path, lineno, st.operation_str,
                           "fwd" if st.direction == FWD else "inv",
                           st.accept, args, [coo.x[0], coo.y[0]], None)
            )
        return

    evals, edims = parse_coord(args)
    ce = _expected_rad(st, evals, st.direction)
    out = [float(coo.x[0]), float(coo.y[0]), float(coo.z[0]), float(coo.t[0])]
    if edims < 4:
        out[3] = 0.0
    if edims < 3:
        out[2] = 0.0

    if st.op.angular_output(st.direction):
        d = math.hypot(
            lp_dist(st.op.ell, out[0], out[1], ce[0], ce[1]), out[2] - ce[2]
        )
    else:
        d = math.hypot(math.hypot(out[0] - ce[0], out[1] - ce[1]), out[2] - ce[2])

    if d <= st.tolerance:
        res.ok += 1
    else:
        res.failed += 1
        res.failures.append(
            GieFailure(path, lineno, st.operation_str,
                       "fwd" if st.direction == FWD else "inv",
                       st.accept, args, out, d)
        )


def _flush_roundtrips(res: GieResult, st: _OpState, path: str) -> None:
    """Run an operation's queued roundtrip directives BATCHED: all
    points sharing (direction, n_trips) iterate as ONE coordinate
    array instead of n_trips single-point trans calls each — the
    per-point math is elementwise-identical (every kernel is a lane-
    wise ufunc chain), but the numpy dispatch/errstate overhead that
    dominated the gigs corpus (1000-trip directives on 1-point
    arrays) is paid once per iteration instead of once per point.
    Gie semantics (sequential fwd/inv iteration, per-directive
    tolerance, drift metric) are unchanged."""
    pend = st.pending_roundtrips
    st.pending_roundtrips = []
    if not pend or st.op is None:
        return
    groups: dict = {}
    for args, lineno, accept, direction, tol0 in pend:
        cols = args.split()
        ntrips = 100
        tol = tol0
        if cols:
            try:
                ntrips = int(float(cols[0]))
            except ValueError:
                pass
            if len(cols) >= 2:
                t = _strtod_scaled(" ".join(cols[1:]), 1.0)
                tol = tol0 if math.isinf(t) else t
        groups.setdefault((direction, ntrips), []).append(
            (accept, tol, lineno, args)
        )
    for (direction, ntrips), items in groups.items():
        res.total += len(items)
        singles = [_to_coords(st, acc, direction) for acc, _, _, _ in items]
        org = Coords(
            np.concatenate([c.x for c in singles]),
            np.concatenate([c.y for c in singles]),
            np.concatenate([c.z for c in singles]),
            np.concatenate([c.t for c in singles]),
        )
        cur = org.copy()
        opposite = INV if direction == FWD else FWD
        try:
            st.op.trans(direction, cur)
            for _ in range(ntrips - 1):
                st.op.trans(opposite, cur)
                st.op.trans(direction, cur)
            st.op.trans(opposite, cur)
        except NotImplementedError:
            res.skipped += len(items)
            res.skipped_ops.add(st.operation_str)
            continue
        angular = st.op.angular_input(direction)
        for i, (accept, tol, lineno, args) in enumerate(items):
            if angular:
                d = math.hypot(
                    lp_dist(st.op.ell, float(cur.x[i]), float(cur.y[i]),
                            float(org.x[i]), float(org.y[i])),
                    float(cur.z[i]) - float(org.z[i]),
                )
            else:
                d = math.hypot(
                    math.hypot(float(cur.x[i]) - float(org.x[i]),
                               float(cur.y[i]) - float(org.y[i])),
                    float(cur.z[i]) - float(org.z[i]),
                )
            if d <= tol:
                res.ok += 1
            else:
                res.failed += 1
                res.failures.append(
                    GieFailure(path, lineno, st.operation_str, "roundtrip",
                               accept, args,
                               [float(cur.x[i]), float(cur.y[i])], d)
                )
