"""Pipeline operator (+step chains) with push/pop coordinate stack.

Semantics per /root/reference/src/pipeline.cpp: step args = local args
followed by global args (:506-516); per-step +inv toggles the step's
``inverted`` flag (:543-548); +omit_fwd/+omit_inv (:550-552); the
pipeline itself is a raw bit mover (prep/fin skipped, :466-470);
io-unit propagation replaces WHATEVER with neighbour units and
mismatches fail (:583-618); pipeline left/right = first step's
left / last step's right (:624-628); push/pop keep a per-channel
stack (:631-718) — batch-native here: each stack entry is a whole
column array.

In the Ray Data engine a pipeline is exactly ONE fused map_batches
kernel chain: all steps run inside a single UDF over the batch.
"""

from __future__ import annotations

from ..core.errors import ERR_MALFORMED_PIPELINE, ProjError
from ..core.op import FWD, INV, IO_WHATEVER, Coords, Operation
from ..core.params import Params
from . import register


class Pipeline(Operation):
    name = "pipeline"
    need_ellps = False

    def __init__(self, params, ell):
        super().__init__(params, ell)
        self.steps: list[Operation] = []
        self.omit_fwd: list[bool] = []
        self.omit_inv: list[bool] = []
        self.stack: list[list] = [[], [], [], []]
        self.skip_fwd_prepare = True
        self.skip_fwd_finalize = True
        self.skip_inv_prepare = True
        self.skip_inv_finalize = True

    @property
    def has_inverse(self) -> bool:
        return all(s.has_inverse for s in self.steps)

    def _fwd(self, coo: Coords) -> None:
        for step, omit in zip(self.steps, self.omit_fwd):
            if not omit:
                step.trans(FWD, coo)

    def _inv(self, coo: Coords) -> None:
        if not self.has_inverse:
            raise ProjError(ERR_MALFORMED_PIPELINE, "pipeline has no inverse")
        for step, omit in zip(reversed(self.steps), reversed(self.omit_inv)):
            if not omit:
                step.trans(INV, coo)


def make_pipeline(params: Params) -> Pipeline:
    """Pipeline constructor (pipeline.cpp:422-628)."""
    from ..core.ellps import Ellipsoid, resolve_ellipsoid
    from ..core.errors import ProjError as PE
    from ..core.factory import init_operation

    # split tokens into global args (before first 'step') and step groups
    groups: list[list[tuple[str, str | None]]] = [[]]
    for k, v in params.pairs:
        if k == "step":
            groups.append([])
        else:
            groups[-1].append((k, v))
    global_args = groups[0]
    step_groups = [g for g in groups[1:]]
    if len(groups) == 1 or not any(step_groups):
        raise PE(ERR_MALFORMED_PIPELINE, "no steps")

    gp = Params(global_args)
    # pipeline's own ellipsoid: global spec if any, else GRS80 (set_ellipsoid)
    try:
        ell = resolve_ellipsoid(gp)
    except PE:
        f = 1.0 / 298.257222101
        ell = Ellipsoid(a=6378137.0, es=2 * f - f * f, f=f).derive()

    pipe = Pipeline(gp, ell)

    # drop 'proj=pipeline' itself from the inherited global args
    inherited = [(k, v) for k, v in global_args if k != "proj"]

    for sg in step_groups:
        if not sg:
            raise PE(ERR_MALFORMED_PIPELINE, "empty step")
        step_params = Params(sg + inherited)  # local args first → they win
        if step_params.str_("proj") == "pipeline":
            raise PE(ERR_MALFORMED_PIPELINE, "nested pipelines not allowed")
        # steps get full cs2cs emulation, like proj_create'd objects
        step = init_operation(step_params, cs2cs_emulation=True)
        step.parent = pipe
        # +inv in local and/or global args toggles (pipeline.cpp:543-548)
        for k, _ in sg + inherited:
            if k == "inv":
                step.inverted = not step.inverted
        pipe.steps.append(step)
        pipe.omit_fwd.append(step_params.bool_("omit_fwd", False))
        pipe.omit_inv.append(step_params.bool_("omit_inv", False))

    # Require a forward path through the pipeline (pipeline.cpp:559-567):
    # an inverted step must expose an inverse kernel
    for step in pipe.steps:
        if step.inverted and not step.has_inverse:
            raise PE(ERR_MALFORMED_PIPELINE,
                     "a forward operation couldn't be constructed")

    # io-unit propagation (pipeline.cpp:583-605)
    n = len(pipe.steps)

    def next_non_whatever(i: int, direction: int) -> str:
        rng = range(i + 1, n) if direction == FWD else range(i - 1, -1, -1)
        for j in rng:
            s = pipe.steps[j]
            near = s.eff_left() if direction == FWD else s.eff_right()
            far = s.eff_right() if direction == FWD else s.eff_left()
            if near != far:
                return near
            if near != IO_WHATEVER:
                return near
            if far != IO_WHATEVER:
                return far
        return IO_WHATEVER

    def set_eff(s: Operation, left: str, right: str) -> None:
        if s.inverted:
            s.left, s.right = right, left
        else:
            s.left, s.right = left, right

    for i, s in enumerate(pipe.steps):
        if s.eff_left() == IO_WHATEVER and s.eff_right() == IO_WHATEVER:
            set_eff(s, next_non_whatever(i, FWD), next_non_whatever(i, FWD))
    for i in range(n - 1, -1, -1):
        s = pipe.steps[i]
        if s.eff_left() == IO_WHATEVER and s.eff_right() == IO_WHATEVER:
            set_eff(s, next_non_whatever(i, INV), next_non_whatever(i, INV))

    # unit chaining check (pipeline.cpp:608-618)
    for i in range(n - 1):
        out_u = pipe.steps[i].eff_right()
        in_u = pipe.steps[i + 1].eff_left()
        if out_u == IO_WHATEVER or in_u == IO_WHATEVER:
            continue
        if out_u != in_u:
            raise PE(ERR_MALFORMED_PIPELINE, f"unit mismatch between steps {i+1} and {i+2}")

    pipe.left = pipe.steps[0].eff_left()
    pipe.right = pipe.steps[-1].eff_right()
    return pipe


@register
class Push(Operation):
    """Save coordinate channels on the owning pipeline's stack."""

    name = "push"
    need_ellps = False

    def setup(self) -> None:
        self.v = [self.params.has(f"v_{i}") for i in (1, 2, 3, 4)]
        self.left = IO_WHATEVER
        self.right = IO_WHATEVER

    def _push(self, coo: Coords) -> None:
        if self.parent is None:
            return
        for i, on in enumerate(self.v):
            if on:
                lane = (coo.x, coo.y, coo.z, coo.t)[i]
                self.parent.stack[i].append(lane.copy())

    def _pop(self, coo: Coords) -> None:
        if self.parent is None:
            return
        lanes = [coo.x, coo.y, coo.z, coo.t]
        for i, on in enumerate(self.v):
            if on and self.parent.stack[i]:
                lanes[i] = self.parent.stack[i].pop()
        coo.x, coo.y, coo.z, coo.t = lanes

    def _fwd(self, coo: Coords) -> None:
        self._push(coo)

    def _inv(self, coo: Coords) -> None:
        self._pop(coo)


@register
class Pop(Push):
    """Retrieve coordinate channels from the owning pipeline's stack."""

    name = "pop"

    def _fwd(self, coo: Coords) -> None:
        self._pop(coo)

    def _inv(self, coo: Coords) -> None:
        self._push(coo)
