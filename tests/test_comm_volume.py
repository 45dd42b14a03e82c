"""Machine-check of the sharded-BA communication-volume contract.

The scaling claim (`parallel/sharded_ba.py` module docstring; BASELINE.md
north star) is that the CG path's per-iteration communication is O(F*6)
floats — independent of the landmark count P and with no (F*6)^2 term.
Real multi-chip hardware isn't available here, so this is the locally
checkable proxy: compile the 8-device program, walk the optimized HLO, and
bound every cross-device collective's operand size.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_slam_tpu.geometry import camera, se3, so3
from monocular_slam_tpu.optim import ba as ba_mod
from monocular_slam_tpu.parallel import mesh as mesh_mod
from monocular_slam_tpu.parallel import sharded_ba

F, P, OBS = 32, 4096, 256  # P >> F*6 so a P-sized collective would stand out


def _make_problem():
    key = jax.random.PRNGKey(0)
    kx, kn, kt, kp = jax.random.split(key, 4)
    X = 20.0 * jax.random.ball(kx, 3, shape=(P,))
    k = jnp.array([300.0, 300.0, 320.0, 240.0])
    ang = jnp.arange(F) * (2 * jnp.pi / F)

    def cam_pose(a):
        c = jnp.array([60.0 * jnp.sin(a), 0.0, -60.0 * jnp.cos(a)])
        z = -c / jnp.linalg.norm(c)
        x = jnp.cross(jnp.array([0.0, 1.0, 0.0]), z)
        x = x / jnp.linalg.norm(x)
        R = jnp.stack([x, jnp.cross(z, x), z])
        return se3.from_Rt(R, -R @ c)

    poses = jax.vmap(cam_pose)(ang)
    E = F * OBS
    cam_idx = jnp.repeat(jnp.arange(F, dtype=jnp.int32), OBS)
    pt_idx = jax.random.randint(kp, (E,), 0, P, dtype=jnp.int32)
    uv = camera.project(k, se3.apply(poses[cam_idx], X[pt_idx]))
    uv = uv + 0.3 * jax.random.normal(kn, uv.shape)
    return ba_mod.BAProblem(
        poses=se3.compose(se3.exp(0.01 * jax.random.normal(kt, (F, 6))), poses),
        points=X,
        k=jnp.broadcast_to(k, (F, 4)),
        cam_idx=cam_idx,
        pt_idx=pt_idx,
        uv=uv,
        info=jnp.ones(E),
        valid=jnp.ones(E, bool),
        fixed=jnp.zeros(F, bool).at[0].set(True),
    )


_SHAPE_RE = re.compile(r"(f32|f64|s32|u32|pred)\[([0-9,]*)\]")


def _collective_operand_sizes(hlo_text: str) -> list[tuple[str, int]]:
    """(op line, element count) for every cross-replica collective in the
    optimized HLO."""
    out = []
    ops = ("all-reduce(", "all-gather(", "reduce-scatter(", "all-to-all(",
           "collective-permute(")
    for line in hlo_text.splitlines():
        s = line.strip()
        hit = next((op for op in ops if op in s), None)
        if hit is None or "=" not in s:
            continue
        # result shape(s) sit between '=' and the op name:
        #   %x = f32[32,6]{1,0} all-reduce(...)
        #   %y = (f32[192], f32[192,192]) all-reduce(...)
        seg = s.split("=", 1)[1].split(hit)[0]
        shapes = _SHAPE_RE.findall(seg)
        n = 0
        for _, dims in shapes:
            if dims == "":
                n += 1
            else:
                n += int(np.prod([int(d) for d in dims.split(",") if d]))
        out.append((s[:120], n))
    return out


@pytest.mark.parametrize("solver,bound_factor", [("cg", 100), ("dense", None)])
def test_collective_sizes(solver, bound_factor):
    prob = _make_problem()
    mesh = mesh_mod.make_mesh(8, data=1)
    fn, args, _ = sharded_ba.build_sharded_fn(
        prob, mesh, n_iters=2, solver=solver, max_cg_iters=8
    )
    hlo = fn.lower(*args).compile().as_text()
    colls = _collective_operand_sizes(hlo)
    assert colls, "expected cross-device collectives in the compiled HLO"
    sizes = [n for _, n in colls]
    if solver == "cg":
        # Contract: every collective is O(F*6). XLA fuses adjacent psums
        # into one tuple all-reduce (observed: (F,6)x2 + (F,6,6)x2 = 84F
        # elements), so the bound allows a small constant factor; nothing
        # may scale with P or (F*6)^2.
        bound = bound_factor * F
        offenders = [(l, n) for l, n in colls if n > bound]
        assert not offenders, f"collectives exceed O(F*6): {offenders}"
        assert max(sizes) < (6 * F) ** 2, "found an (F*6)^2-sized collective"
        assert max(sizes) < P, "found a landmark-sized collective"
    else:
        # dense path DOES psum the (F*6)^2 Schur complement — sanity-check
        # the detector sees it (guards against a vacuous CG assertion)
        assert max(sizes) >= (6 * F) ** 2


def test_cg_comm_model_documented():
    """The analytic bytes/iteration model shipped in benchmarks/scaling.py
    must match the HLO-derived numbers to first order: per CG step one (F,6)
    psum (4*6*F bytes per direction)."""
    from benchmarks import scaling

    model = scaling.cg_comm_bytes_per_iter(F)
    assert model == 4 * 6 * F
