"""Fused Pallas substep kernel for the planar (Box2D-class) engine.

The XLA path (physics/planar.py) unrolls the sequential-impulse solver into
~10k tiny VPU ops per env step whose per-op dispatch dominates: the
correct-physics LunarLander ran at 206K env-steps/s (BENCH_r04), 30x slower
than the old single-body approximation. This module code-generates the SAME
solver — gravity/external integration, Box2D warm starting, accumulated
motor/limit/point/contact impulses over the velocity iterations, and the
non-linear Gauss-Seidel position pass — as straight-line row math inside ONE
Pallas program per 1024-env block (same scheme as ops/pallas_articulated.py:
every per-env scalar is an (8, 128) f32 block, grid over env blocks).

The heightfield is the piecewise-linear chunk terrain the lander uses
(envs/dynamics/lunar_lander.py:ground_height); each contact resolves its
chunk segment ONCE per substep with an unrolled select and re-evaluates the
segment's linear form against fresh probe positions inside the position
pass (sub-mm moves never cross the ~1 m chunks).

Numerics match ``physics.planar.world_step`` chained over the substeps to
f32 round-off; pinned by tests/ops/test_pallas_planar.py. Used by
LunarLanderFunctional as the natively-batched transition on TPU.
"""

from __future__ import annotations

import numpy as np

from gymnasium_tpu.physics.planar import PlanarWorld

__all__ = ["make_fused_planar_step", "BLOCK_ENVS"]

BLOCK_ENVS = 1024  # envs per kernel program: 8 sublanes x 128 lanes

_MAX_ANG_CORR = 8.0 * 3.14159265 / 180.0  # b2_maxAngularCorrection


def make_fused_planar_step(
    world: PlanarWorld,
    chunks: int,
    spacing: float,
    motor_speed: np.ndarray,
    motor_torque: np.ndarray,
    substeps: int = 2,
    interpret: bool = False,
):
    """Build a jitted natively-batched planar step.

    ``(bodies (N,B,6), external (N,B,3), terrain (N,chunks),
    jimp (N,J,5), cimp (N,C,2)) -> (bodies', jimp', cimp', flags (N,C))``
    running ``substeps`` full ``world_step`` ticks in one Pallas kernel per
    BLOCK_ENVS-env block. Motor speed/torque are compile-time constants
    (the lander's leg springs); ``N`` must be a multiple of BLOCK_ENVS.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B = len(world.bodies.inv_mass)
    J = len(world.joints.body_a)
    C = len(world.contacts.body)
    dt = float(world.dt)
    g = float(world.gravity)
    inv_m = [float(v) for v in world.bodies.inv_mass]
    inv_i = [float(v) for v in world.bodies.inv_inertia]
    anchor_a = np.asarray(world.joints.anchor_a, np.float64)
    anchor_b = np.asarray(world.joints.anchor_b, np.float64)
    j_a = [int(v) for v in world.joints.body_a]
    j_b = [int(v) for v in world.joints.body_b]
    j_lower = [float(v) for v in world.joints.lower]
    j_upper = [float(v) for v in world.joints.upper]
    j_ref = [float(v) for v in world.joints.ref_angle]
    c_body = [int(v) for v in world.contacts.body]
    c_point = np.asarray(world.contacts.point, np.float64)
    c_mu = [float(v) for v in world.contacts.friction]
    ms = [float(v) for v in np.asarray(motor_speed)]
    mt = [float(v) for v in np.asarray(motor_torque)]
    baum = float(world.baumgarte)
    slop = float(world.contact_slop)
    max_corr = float(world.max_correction)

    def ground_segment(t_rows, px):
        """Resolve the terrain segment under ``px``: returns (h0, slope,
        i0) with gy = h0 + (px/spacing - i0) * slope, via an unrolled
        select over the chunk index."""
        xc = jnp.clip(px * (1.0 / spacing), 0.0, chunks - 1 - 1e-6)
        i0 = jnp.floor(xc)
        h0 = t_rows[0]
        h1 = t_rows[1]
        for i in range(1, chunks - 1):
            sel = i0 >= i
            h0 = jnp.where(sel, t_rows[i], h0)
            h1 = jnp.where(sel, t_rows[min(i + 1, chunks - 1)], h1)
        return h0, h1 - h0, i0

    def seg_eval(seg, px):
        h0, slope, i0 = seg
        xc = jnp.clip(px * (1.0 / spacing), 0.0, chunks - 1 - 1e-6)
        return h0 + (xc - i0) * slope

    def substep_rows(jnp, body, ext, t_rows, jimp, cimp):
        """One world_step over row blocks. ``body``: [B][6] rows,
        ``ext``: [B][3], ``jimp``: [J][5], ``cimp``: [C][2]. Returns the
        updated row lists plus the pre-step contact flags."""
        x = [body[b][0] for b in range(B)]
        y = [body[b][1] for b in range(B)]
        ang = [body[b][2] for b in range(B)]
        vx = [body[b][3] for b in range(B)]
        vy = [body[b][4] for b in range(B)]
        w = [body[b][5] for b in range(B)]

        # --- integrate gravity + external forces --------------------------
        for b in range(B):
            if inv_m[b] > 0:
                vy[b] = vy[b] + g * dt
                vx[b] = vx[b] + ext[b][0] * (inv_m[b] * dt)
                vy[b] = vy[b] + ext[b][1] * (inv_m[b] * dt)
                w[b] = w[b] + ext[b][2] * (inv_i[b] * dt)

        cos = [jnp.cos(ang[b]) for b in range(B)]
        sin = [jnp.sin(ang[b]) for b in range(B)]

        # joint anchor arms (pre-step pose)
        arms = []
        for j in range(J):
            a, b = j_a[j], j_b[j]
            ax, ay = float(anchor_a[j, 0]), float(anchor_a[j, 1])
            bx, by = float(anchor_b[j, 0]), float(anchor_b[j, 1])
            rax = ax * cos[a] - ay * sin[a]
            ray = ax * sin[a] + ay * cos[a]
            rbx = bx * cos[b] - by * sin[b]
            rby = bx * sin[b] + by * cos[b]
            arms.append((a, b, rax, ray, rbx, rby))

        # contact probes: world arm, depth, frozen terrain segment
        cdata = []
        for k in range(C):
            b = c_body[k]
            px_, py_ = float(c_point[k, 0]), float(c_point[k, 1])
            rx = px_ * cos[b] - py_ * sin[b]
            ry = px_ * sin[b] + py_ * cos[b]
            wx = x[b] + rx
            wy = y[b] + ry
            seg = ground_segment(t_rows, wx)
            depth = seg_eval(seg, wx) - wy
            cdata.append((b, rx, ry, depth, seg))
        flags = [cd[3] > 0.0 for cd in cdata]

        # --- warm starting (Box2D b2Island::initVelocityConstraints) ------
        acc_m = [jimp[j][0] for j in range(J)]
        acc_lo = [jimp[j][1] for j in range(J)]
        acc_up = [jimp[j][2] for j in range(J)]
        acc_jx = [jimp[j][3] for j in range(J)]
        acc_jy = [jimp[j][4] for j in range(J)]
        for j in range(J):
            a, b, rax, ray, rbx, rby = arms[j]
            ang_l = acc_m[j] + acc_lo[j] + acc_up[j]
            px_, py_ = acc_jx[j], acc_jy[j]
            vx[a] = vx[a] - px_ * inv_m[a]
            vy[a] = vy[a] - py_ * inv_m[a]
            vx[b] = vx[b] + px_ * inv_m[b]
            vy[b] = vy[b] + py_ * inv_m[b]
            w[a] = w[a] - ((rax * py_ - ray * px_) + ang_l) * inv_i[a]
            w[b] = w[b] + ((rbx * py_ - rby * px_) + ang_l) * inv_i[b]
        acc_n = [None] * C
        acc_t = [None] * C
        for k in range(C):
            b, rx, ry, depth, _ = cdata[k]
            live = depth > 0.0
            jn = jnp.where(live, cimp[k][0], 0.0)
            jt = jnp.where(live, cimp[k][1], 0.0)
            acc_n[k], acc_t[k] = jn, jt
            vx[b] = vx[b] + jt * inv_m[b]
            vy[b] = vy[b] + jn * inv_m[b]
            w[b] = w[b] + (rx * jn - ry * jt) * inv_i[b]

        # --- velocity iterations ------------------------------------------
        for _ in range(world.velocity_iterations):
            for j in range(J):
                a, b, rax, ray, rbx, rby = arms[j]
                k_ang = max(inv_i[a] + inv_i[b], 1e-9)

                # motor toward its target relative speed, total impulse
                # clamped to maxMotorTorque * dt
                rel = w[b] - w[a]
                raw = (ms[j] - rel) * (1.0 / k_ang)
                max_imp = mt[j] * dt
                new_acc = jnp.clip(acc_m[j] + raw, -max_imp, max_imp)
                imp = new_acc - acc_m[j]
                acc_m[j] = new_acc
                w[a] = w[a] - imp * inv_i[a]
                w[b] = w[b] + imp * inv_i[b]

                # limits: block velocity into a violated limit
                j_angle = ang[b] - ang[a] - j_ref[j]
                rel = w[b] - w[a]
                at_lower = j_angle - j_lower[j] < 0
                raw = jnp.where(at_lower, -rel * (1.0 / k_ang), -acc_lo[j])
                new_acc = jnp.maximum(acc_lo[j] + raw, 0.0)
                imp = new_acc - acc_lo[j]
                acc_lo[j] = new_acc
                w[a] = w[a] - imp * inv_i[a]
                w[b] = w[b] + imp * inv_i[b]
                rel = w[b] - w[a]
                at_upper = j_upper[j] - j_angle < 0
                raw = jnp.where(at_upper, -rel * (1.0 / k_ang), -acc_up[j])
                new_acc = jnp.minimum(acc_up[j] + raw, 0.0)
                imp = new_acc - acc_up[j]
                acc_up[j] = new_acc
                w[a] = w[a] - imp * inv_i[a]
                w[b] = w[b] + imp * inv_i[b]

                # point constraint (2x2 solve)
                vax = vx[a] - w[a] * ray
                vay = vy[a] + w[a] * rax
                vbx = vx[b] - w[b] * rby
                vby = vy[b] + w[b] * rbx
                cdx = vbx - vax
                cdy = vby - vay
                k11 = inv_m[a] + inv_m[b] + inv_i[a] * ray * ray + inv_i[b] * rby * rby
                k12 = -inv_i[a] * rax * ray - inv_i[b] * rbx * rby
                k22 = inv_m[a] + inv_m[b] + inv_i[a] * rax * rax + inv_i[b] * rbx * rbx
                det = k11 * k22 - k12 * k12
                det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
                ix = -(k22 * cdx - k12 * cdy) / det
                iy = -(k11 * cdy - k12 * cdx) / det
                acc_jx[j] = acc_jx[j] + ix
                acc_jy[j] = acc_jy[j] + iy
                vx[a] = vx[a] - ix * inv_m[a]
                vy[a] = vy[a] - iy * inv_m[a]
                vx[b] = vx[b] + ix * inv_m[b]
                vy[b] = vy[b] + iy * inv_m[b]
                w[a] = w[a] - (rax * iy - ray * ix) * inv_i[a]
                w[b] = w[b] + (rbx * iy - rby * ix) * inv_i[b]

            for k in range(C):
                b, rx, ry, depth, _ = cdata[k]
                active = depth > 0.0
                pvy = vy[b] + w[b] * rx
                k_n = jnp.maximum(inv_m[b] + inv_i[b] * rx * rx, 1e-9)
                raw_n = jnp.where(active, -pvy / k_n, -acc_n[k])
                na = jnp.maximum(acc_n[k] + raw_n, 0.0)
                jn = na - acc_n[k]
                acc_n[k] = na
                vy[b] = vy[b] + jn * inv_m[b]
                w[b] = w[b] + rx * jn * inv_i[b]

                pvx = vx[b] - w[b] * ry
                k_t = jnp.maximum(inv_m[b] + inv_i[b] * ry * ry, 1e-9)
                raw_t = jnp.where(active, -pvx / k_t, -acc_t[k])
                ta = jnp.clip(acc_t[k] + raw_t, -c_mu[k] * na, c_mu[k] * na)
                jt = ta - acc_t[k]
                acc_t[k] = ta
                vx[b] = vx[b] + jt * inv_m[b]
                w[b] = w[b] - ry * jt * inv_i[b]

        # --- integrate positions -------------------------------------------
        for b in range(B):
            x[b] = x[b] + vx[b] * dt
            y[b] = y[b] + vy[b] * dt
            ang[b] = ang[b] + w[b] * dt

        # --- position pass (contacts first, then joints) --------------------
        for _ in range(world.position_iterations):
            for k in range(C):
                b = c_body[k]
                px_, py_ = float(c_point[k, 0]), float(c_point[k, 1])
                cb, sb = jnp.cos(ang[b]), jnp.sin(ang[b])
                rx = px_ * cb - py_ * sb
                ry = px_ * sb + py_ * cb
                wx = x[b] + rx
                wy = y[b] + ry
                seg = ground_segment(t_rows, wx)
                depth = seg_eval(seg, wx) - wy
                corr = jnp.clip(baum * (depth - slop), 0.0, max_corr)
                k_n = jnp.maximum(inv_m[b] + inv_i[b] * rx * rx, 1e-9)
                lam = corr / k_n
                y[b] = y[b] + lam * inv_m[b]
                ang[b] = ang[b] + rx * lam * inv_i[b]

            for j in range(J):
                a, b = j_a[j], j_b[j]
                k_ang = max(inv_i[a] + inv_i[b], 1e-9)
                j_angle = ang[b] - ang[a] - j_ref[j]
                over_low = jnp.minimum(j_angle - j_lower[j], 0.0)
                over_up = jnp.maximum(j_angle - j_upper[j], 0.0)
                corr = jnp.clip(-(over_low + over_up), -_MAX_ANG_CORR, _MAX_ANG_CORR)
                ang[a] = ang[a] - corr * (inv_i[a] / k_ang)
                ang[b] = ang[b] + corr * (inv_i[b] / k_ang)

                ca, sa = jnp.cos(ang[a]), jnp.sin(ang[a])
                cb, sb = jnp.cos(ang[b]), jnp.sin(ang[b])
                ax_, ay_ = float(anchor_a[j, 0]), float(anchor_a[j, 1])
                bx_, by_ = float(anchor_b[j, 0]), float(anchor_b[j, 1])
                rax = ax_ * ca - ay_ * sa
                ray = ax_ * sa + ay_ * ca
                rbx = bx_ * cb - by_ * sb
                rby = bx_ * sb + by_ * cb
                errx = (x[b] + rbx) - (x[a] + rax)
                erry = (y[b] + rby) - (y[a] + ray)
                k11 = inv_m[a] + inv_m[b] + inv_i[a] * ray * ray + inv_i[b] * rby * rby
                k12 = -inv_i[a] * rax * ray - inv_i[b] * rbx * rby
                k22 = inv_m[a] + inv_m[b] + inv_i[a] * rax * rax + inv_i[b] * rbx * rbx
                det = k11 * k22 - k12 * k12
                det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
                ix = -(k22 * errx - k12 * erry) / det
                iy = -(k11 * erry - k12 * errx) / det
                x[a] = x[a] - ix * inv_m[a]
                y[a] = y[a] - iy * inv_m[a]
                x[b] = x[b] + ix * inv_m[b]
                y[b] = y[b] + iy * inv_m[b]
                ang[a] = ang[a] - (rax * iy - ray * ix) * inv_i[a]
                ang[b] = ang[b] + (rbx * iy - rby * ix) * inv_i[b]

        body_out = [[x[b], y[b], ang[b], vx[b], vy[b], w[b]] for b in range(B)]
        jimp_out = [[acc_m[j], acc_lo[j], acc_up[j], acc_jx[j], acc_jy[j]] for j in range(J)]
        cimp_out = [[acc_n[k], acc_t[k]] for k in range(C)]
        return body_out, jimp_out, cimp_out, flags

    def program(jnp, body, ext, t_rows, jimp, cimp):
        flags = None
        for _ in range(substeps):
            body, jimp, cimp, flags = substep_rows(jnp, body, ext, t_rows, jimp, cimp)
        return body, jimp, cimp, flags

    import jax.numpy as jnp_mod

    def kernel(body_ref, ext_ref, terr_ref, jimp_ref, cimp_ref,
               body_o, jimp_o, cimp_o, flag_o):
        rows = lambda ref, n: [ref[8 * i : 8 * i + 8, :] for i in range(n)]
        body = [rows(body_ref, 6 * B)[6 * b : 6 * b + 6] for b in range(B)]
        ext = [rows(ext_ref, 3 * B)[3 * b : 3 * b + 3] for b in range(B)]
        t_rows = rows(terr_ref, chunks)
        jimp = [rows(jimp_ref, 5 * J)[5 * j : 5 * j + 5] for j in range(J)]
        cimp = [rows(cimp_ref, 2 * C)[2 * k : 2 * k + 2] for k in range(C)]
        body, jimp, cimp, flags = program(jnp_mod, body, ext, t_rows, jimp, cimp)
        body_o[:, :] = jnp_mod.concatenate([r for b in body for r in b], axis=0)
        jimp_o[:, :] = jnp_mod.concatenate([r for j in jimp for r in j], axis=0)
        cimp_o[:, :] = jnp_mod.concatenate([r for c in cimp for r in c], axis=0)
        flag_o[:, :] = jnp_mod.concatenate(
            [f.astype(jnp_mod.float32) for f in flags], axis=0
        )

    def rows_step(body_rows, ext_rows, t_rows, jimp_rows, cimp_rows):
        """The same row program as a PLAIN jnp function over stacked blocks —
        used by CPU equivalence tests without the Pallas interpreter."""
        body = [[body_rows[6 * b + i] for i in range(6)] for b in range(B)]
        ext = [[ext_rows[3 * b + i] for i in range(3)] for b in range(B)]
        jimp = [[jimp_rows[5 * j + i] for i in range(5)] for j in range(J)]
        cimp = [[cimp_rows[2 * k + i] for i in range(2)] for k in range(C)]
        return program(jnp_mod, body, ext, list(t_rows), jimp, cimp)

    import jax

    @jax.jit
    def step_batched(bodies, external, terrain, jimp, cimp):
        """bodies (N,B,6), external (N,B,3), terrain (N,chunks),
        jimp (N,J,5), cimp (N,C,2) -> (bodies', jimp', cimp', flags)."""
        n = bodies.shape[0]
        assert n % BLOCK_ENVS == 0, f"N={n} must be a multiple of {BLOCK_ENVS}"
        nblk = n // BLOCK_ENVS

        def to_blocks(v, rows):
            v = v.reshape(n, rows).astype(jnp_mod.float32)
            return (
                v.reshape(nblk, 8, 128, rows)
                .transpose(0, 3, 1, 2)
                .reshape(nblk * rows * 8, 128)
            )

        def from_blocks(v, rows):
            return (
                v.reshape(nblk, rows, 8, 128).transpose(0, 2, 3, 1).reshape(n, rows)
            )

        bb = to_blocks(bodies, 6 * B)
        eb = to_blocks(external, 3 * B)
        tb = to_blocks(terrain, chunks)
        jb = to_blocks(jimp, 5 * J)
        cb = to_blocks(cimp, 2 * C)

        from jax.experimental import pallas as pl

        spec = lambda rows: pl.BlockSpec((rows * 8, 128), lambda i: (i, 0))
        shape = lambda rows: jax.ShapeDtypeStruct((nblk * rows * 8, 128), jnp_mod.float32)
        bo, jo, co, fo = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(nblk,),
            in_specs=[spec(6 * B), spec(3 * B), spec(chunks), spec(5 * J), spec(2 * C)],
            out_specs=[spec(6 * B), spec(5 * J), spec(2 * C), spec(C)],
            out_shape=[shape(6 * B), shape(5 * J), shape(2 * C), shape(C)],
        )(bb, eb, tb, jb, cb)
        return (
            from_blocks(bo, 6 * B).reshape(n, B, 6),
            from_blocks(jo, 5 * J).reshape(n, J, 5),
            from_blocks(co, 2 * C).reshape(n, C, 2),
            from_blocks(fo, C) > 0.5,
        )

    step_batched.rows_step = rows_step
    return step_batched
