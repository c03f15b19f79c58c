"""The jitted alternating-GAN train step (reference trainer.py:239-518).

One compiled function performs, per iteration:
  D-step: encode → render (Xer, Xir, Xer90) → critic on detached images →
          WGAN-GP / LSGAN loss → Adam update of D             (trainer.py:243-418)
  G-step: critic (updated D) on the SAME rendered images → recon + mesh
          regularizers + interpolated-cycle + disentangle losses → Adam
          update of E                                         (trainer.py:420-518)

TPU-first structure: the expensive encoder+render forward runs ONCE under
``jax.vjp``; the D update consumes its stop-gradient outputs, and the G update
backpropagates through the saved linearization — the same compute shape as
the reference's retain-graph trick, with no Python-side graph bookkeeping.
The learning rates, warm-up factor, and RNG are runtime scalars, so a single
XLA executable serves the whole schedule; only ``train_shape`` (the
encoder-freezing policy, 4 distinct values) retraces.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..losses import gan as gan_losses
from ..losses.chamfer import chamfer_distance
from ..losses.attributes import angle2xy
from ..render.renderer import deep_copy
from .optim import apply_updates_scaled


def _sn(x, eps=1e-12):
    """safe L2 norm along axis 1 (defined gradient at 0)."""
    return jnp.sqrt(jnp.sum(x * x, axis=1) + eps)


def _white_composite(x):
    """img*mask + white*(1-mask) on an NHWC RGBA batch (reference
    smr_utils.py:198-202)."""
    img, m = x[..., :3], x[..., 3:4]
    return img * m + (1.0 - m)


def _fliplr(x):
    return x[:, :, ::-1, :]


def _random_erase(rng, x):
    """torchvision RandomErasing(p=1) semantics (reference trainer.py:476):
    per-sample random rectangle (scale 0.02..0.33, ratio 0.3..3.3) zeroed."""
    B, H, W, C = x.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    area = jax.random.uniform(k1, (B,), minval=0.02, maxval=0.33) * (H * W)
    log_ratio = jax.random.uniform(k2, (B,), minval=jnp.log(0.3), maxval=jnp.log(3.3))
    ratio = jnp.exp(log_ratio)
    h = jnp.sqrt(area * ratio).astype(jnp.int32).clip(1, H)
    w = jnp.sqrt(area / ratio).astype(jnp.int32).clip(1, W)
    top = (jax.random.uniform(k3, (B,)) * (H - h)).astype(jnp.int32)
    left = (jax.random.uniform(k4, (B,)) * (W - w)).astype(jnp.int32)
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    inside = ((rows >= top[:, None, None]) & (rows < (top + h)[:, None, None])
              & (cols >= left[:, None, None]) & (cols < (left + w)[:, None, None]))
    return jnp.where(inside[..., None], 0.0, x)


def _resample_bad(rng, perm, bad):
    """Replace permutation entries that point at collapsed samples with random
    good indices (reference trainer.py:292-308)."""
    B = perm.shape[0]
    good = jnp.logical_not(bad)
    any_good = jnp.any(good)
    logits = jnp.where(good, 0.0, -1e9)
    repl = jax.random.categorical(rng, logits[None].repeat(B, 0), axis=-1)
    return jnp.where(bad[perm] & any_good, repl, perm)


def _select_masks(unmask, Xa, Xer90, Xir):
    """reference trainer.py:370-381."""
    if unmask == 1:
        return Xa[..., :3], Xer90[..., :3], Xir[..., :3]
    if unmask == 0:
        return _white_composite(Xa), _white_composite(Xer90), _white_composite(Xir)
    if unmask == 2:
        return Xa, Xer90, Xir
    raise ValueError("unmask must be 0/1/2")


def regularization(diffRender, Ae, Ai, Aire, opt):
    """Aggregate mesh/flip/IC regularizers (reference trainer.py:54-74)."""
    lossR_reg = opt.lambda_reg * (
        diffRender.calc_reg_loss(Ae) + diffRender.calc_reg_loss(Ai)) / 2.0
    lossR_flip = opt.lambda_flipz * (
        diffRender.recon_flip(Ae, L1=opt.flipL1)
        + diffRender.recon_flip(Ai, L1=opt.flipL1)
        + diffRender.recon_flip(Aire, L1=opt.flipL1)) / 3.0
    if opt.lambda_edge > 0:
        lossR_reg += opt.lambda_edge * (
            diffRender.calc_reg_edge(Ae["vertices"])
            + diffRender.calc_reg_edge(Ai["vertices"])) / 2.0
    if opt.lambda_depth > 0:
        lossR_reg += opt.lambda_depth * (
            diffRender.calc_reg_depth(Ae["vertices"])
            + diffRender.calc_reg_depth(Ai["vertices"])) / 2.0
    if opt.lambda_depthR > 0:
        lossR_reg += opt.lambda_depthR * (
            diffRender.calc_reg_depthR(Ae["vertices"], temp=opt.temp)
            + diffRender.calc_reg_depthR(Ai["vertices"], temp=opt.temp)) / 2.0
    if opt.lambda_depthC > 0:
        lossR_reg += opt.lambda_depthC * (
            diffRender.calc_reg_depthC(Ae["vertices"])
            + diffRender.calc_reg_depthC(Ai["vertices"])) / 2.0
    if opt.lambda_deform > 0:
        lossR_reg += opt.lambda_deform * (
            diffRender.calc_reg_deform(Ae["delta_vertices"])
            + diffRender.calc_reg_deform(Ai["delta_vertices"])) / 2.0

    loss_cam, loss_shape, loss_texture, loss_light, loss_bias = diffRender.recon_att(
        Aire, deep_copy(Ai, detach=True), L1=opt.L1, chamfer=opt.chamfer,
        azim=opt.azim)
    lossR_IC = opt.lambda_ic * (
        loss_cam + loss_shape + loss_texture + loss_light + loss_bias)
    return lossR_reg, lossR_flip, lossR_IC


def make_train_step(opt, diffRender, netE, netD, opt_e, opt_d, lpl,
                    precond_M=None, donate: bool = False,
                    steps_per_call: int = 1):
    """Build the jitted train step.  ``opt`` is the (static) flag namespace.

    ``steps_per_call`` > 1 returns a scanned variant executing that many
    sequential D+G steps per dispatch (stacked inputs) — amortizes the
    per-step host dispatch of the remote-execution path (~56 ms at
    b16/128², docs/DESIGN.md train-step table).  Semantics are identical
    to calling the 1-step fn N times (tests/test_train_step.py)."""

    def apply_e(params, stats, x, template, rng, train_shape):
        variables = {"params": params, "batch_stats": stats}
        att, mut = netE.apply(
            variables, x, template, lpl, train_shape=train_shape, train=True,
            precond_M=precond_M, rngs={"dropout": rng},
            mutable=["batch_stats"])
        new_stats = mut["batch_stats"]
        # frozen branches must not advance their BN running stats (the
        # reference's deep-copied frozen encoders discard them,
        # networks.py:583-609)
        from ..models.attribute_encoder import (
            CAMERA_FROZEN, SHAPE_FROZEN, TEXTURE_FROZEN)

        new_stats = dict(new_stats)
        if train_shape in SHAPE_FROZEN and "shape_enc" in new_stats:
            new_stats["shape_enc"] = stats["shape_enc"]
        if train_shape in CAMERA_FROZEN and "camera_enc" in new_stats:
            new_stats["camera_enc"] = stats["camera_enc"]
        if train_shape in TEXTURE_FROZEN:
            for k in ("texture_enc", "light_enc"):
                if k in new_stats:
                    new_stats[k] = stats[k]
        return att, new_stats

    def apply_d(params, x):
        return netD.apply({"params": params}, x)

    def e_outputs(params_e, stats_e, Xa, template, rng, train_shape):
        """Everything downstream of the encoder parameters, in one forward."""
        ks = jax.random.split(rng, 13)
        B = Xa.shape[0]

        Ae, stats1 = apply_e(params_e, stats_e, Xa, template, ks[0], train_shape)
        Xer, Ae = diffRender.render(no_mask=opt.bg, **Ae)

        # hard negatives: random large azimuths (reference trainer.py:279-289)
        if opt.hard:
            Ae90 = deep_copy(Ae)
            branch = jax.random.bernoulli(ks[1])
            az1 = -jax.random.uniform(ks[2], (B,), minval=opt.hard_range,
                                      maxval=180.0 - opt.hard_range)
            az2 = -jax.random.uniform(ks[2], (B,), minval=0.0, maxval=180.0)
            az = jnp.where(branch, az1, az2)
            sign = jnp.where(jax.random.uniform(ks[3], (B,)) < 0.5, -1.0, 1.0)
            Ae90["azimuths"] = az * sign
        else:
            Ae90 = None

        # collapse guard + interpolation partners (reference trainer.py:292-342)
        mean_delta = jnp.mean(jnp.abs(Ae["delta_vertices"])[:, -1], axis=1)
        bad = mean_delta > 0.4
        rand_a = jax.random.permutation(ks[4], B)
        rand_b = jax.random.permutation(ks[5], B)
        if opt.inv == 0:
            rand_a = _resample_bad(ks[6], rand_a, bad)
            rand_b = _resample_bad(ks[7], rand_b, bad)
        Aa = deep_copy(Ae, rand_a)
        Ab = deep_copy(Ae, rand_b)

        if opt.lambda_ic > 0.0:
            Ai = {}
            Ai["azimuths"] = -jax.random.uniform(
                ks[8], (B,), minval=-opt.azi_scope / 2, maxval=opt.azi_scope / 2)
            elev_min, elev_max = [float(v) for v in opt.elev_range.split("~")]
            dist_min, dist_max = [float(v) for v in opt.dist_range.split("~")]
            kk = jax.random.split(ks[9], 5)
            Ai["elevations"] = jax.random.uniform(kk[0], (B,), minval=elev_min,
                                                  maxval=elev_max)
            Ai["distances"] = jax.random.uniform(kk[1], (B,), minval=dist_min,
                                                 maxval=dist_max)
            Ai["biases"] = jax.random.uniform(kk[2], (B, 2),
                                              minval=-opt.bias_range,
                                              maxval=opt.bias_range)
            if opt.beta > 0:
                beta = min(1.0, opt.beta)
                alpha = jax.random.beta(kk[3], beta, beta, (B,))
                alpha_texture = alpha.reshape(B, 1, 1, 1)
                alpha_shape = (1.0 - alpha).reshape(B, 1, 1)
            else:
                alpha_texture = jax.random.uniform(kk[3], (B, 1, 1, 1))
                alpha_shape = jax.random.uniform(kk[4], (B, 1, 1))
            Ai["vertices"] = alpha_shape * Aa["vertices"] + (1 - alpha_shape) * Ab["vertices"]
            Ai["delta_vertices"] = (alpha_shape * Aa["delta_vertices"]
                                    + (1 - alpha_shape) * Ab["delta_vertices"])
            Ai["textures"] = (alpha_texture * Aa["textures"]
                              + (1.0 - alpha_texture) * Ab["textures"])
            if opt.bg:
                Ai["bg"] = (alpha_texture * Aa["bg"]
                            + (1.0 - alpha_texture) * Ab["bg"])
            else:
                Ai["bg"] = None
            alpha_light = jax.random.uniform(kk[4], (B, 1))
            Ai["lights"] = (alpha_light * Aa["lights"]
                            + (1.0 - alpha_light) * Ab["lights"])
        else:
            Ai = Ae

        Xir, Ai = diffRender.render(no_mask=opt.bg, **Ai)
        if opt.hard:
            Xer90, Ae90 = diffRender.render(no_mask=opt.bg, **Ae90)
        else:
            Xer90 = Xer

        Aire, stats2 = apply_e(params_e, stats1,
                               jax.lax.stop_gradient(Xir), template,
                               ks[10], 0)
        _, Aire = diffRender.render(no_mask=opt.bg, **Aire)

        Ma, Mer90, Mir = _select_masks(opt.unmask, Xa, Xer90, Xir)

        # pull the int32 rasterizer-overflow counters OUT of the attribute
        # dicts (outs is differentiated; grad rejects integer inputs) and
        # carry one float diagnostic instead
        drops = [a.pop("dropped_faces") for a in (Ae, Ai, Aire)
                 if isinstance(a, dict) and "dropped_faces" in a]
        tex_drops = [a.pop("dropped_tex_chunks") for a in (Ae, Ai, Aire)
                     if isinstance(a, dict) and "dropped_tex_chunks" in a]
        outs = {
            "Xer": Xer, "Xir": Xir, "Xer90": Xer90,
            "Ma": Ma, "Mer90": Mer90, "Mir": Mir,
            "Ae": Ae, "Ai": Ai, "Aire": Aire,
        }
        if drops:
            outs["dropped_faces"] = jax.lax.stop_gradient(
                sum(jnp.sum(d) for d in drops).astype(jnp.float32))
        if tex_drops:
            # texture-stream overflow: images that fell back to the (exact)
            # dense sampler this step — a perf regression signal, not an
            # accuracy one
            outs["dropped_tex_chunks"] = jax.lax.stop_gradient(
                sum(jnp.sum(d) for d in tex_drops).astype(jnp.float32))
        # disentangle branches (reference trainer.py:456-494)
        if opt.dis1 > 0:
            Ae_fliplr, stats2 = apply_e(params_e, stats2, _fliplr(Xa),
                                        template, ks[11], 0)
            outs["Ae_fliplr"] = Ae_fliplr
        if opt.dis2 > 0:
            k_er, k_en = jax.random.split(ks[11])
            Ae_jitter, stats2 = apply_e(params_e, stats2,
                                        _random_erase(k_er, Xa), template,
                                        k_en, 0)
            outs["Ae_jitter"] = Ae_jitter

        # landmark consistency (reference trainer.py:497-504; inputs that the
        # reference never produces — see renderer.render — are live here)
        if opt.lambda_lc > 0:
            sidx = jax.random.choice(ks[12], diffRender.num_faces, (64,),
                                     replace=False)
            flip_y = jnp.array([1.0, -1.0], jnp.float32)

            def lc(stats, att):
                loss, mut = netE.apply(
                    {"params": params_e, "batch_stats": stats},
                    att["img_feats"], att["faces_image"] * flip_y,
                    att["visiable_faces"], sidx,
                    method="landmark_loss", mutable=["batch_stats"])
                return loss, mut["batch_stats"]

            loss_e, stats2 = lc(stats2, Ae)
            loss_i, stats2 = lc(stats2, Aire)
            outs["lossR_LC"] = opt.lambda_lc * (loss_e + loss_i)
        return outs, stats2

    def d_loss_fn(params_d, outs, rng, warm_up):
        Ma = jax.lax.stop_gradient(outs["Ma"])
        Mer90 = jax.lax.stop_gradient(outs["Mer90"])
        Mir = jax.lax.stop_gradient(outs["Mir"])
        B = Ma.shape[0]
        d_fn = lambda x: apply_d(params_d, x)
        k1, k2 = jax.random.split(rng)
        if opt.gan_type == "wgan":
            out_all = d_fn(jnp.concatenate([Ma, Mer90, Mir], axis=0))
            o0, o1, o2 = jnp.split(out_all, 3, axis=0)
            gp = (gan_losses.gradient_penalty(d_fn, Ma, Mer90, k1)
                  + opt.ganw * gan_losses.gradient_penalty(d_fn, Ma, Mir, k2)
                  ) / (1.0 + opt.ganw)
            lossD, lD_r, lD_f, lD_gp = gan_losses.d_loss_wgan(
                o0, o1, o2, gp, opt.lambda_gan, opt.ganw, opt.gan_reg)
        else:
            outs_all = d_fn(jnp.concatenate([Ma, Mer90, Mir], axis=0))
            o0 = [o[:B] for o in outs_all]
            o1 = [o[B:2 * B] for o in outs_all]
            o2 = [o[2 * B:] for o in outs_all]
            gp = (gan_losses.gradient_penalty_list(d_fn, Ma, Mer90, k1)
                  + opt.ganw * gan_losses.gradient_penalty_list(d_fn, Ma, Mir, k2)
                  ) / (1.0 + opt.ganw)
            lossD, lD_r, lD_f, lD_gp = gan_losses.d_loss_lsgan(
                o0, o1, o2, gp, opt.lambda_gan, opt.ganw, opt.gan_reg)
        lossD = lossD * warm_up
        return lossD, (lD_r, lD_f, lD_gp)

    def e_loss_fn(outs, params_d, Xa, Va, warm_up):
        B = Xa.shape[0]
        d_fn = lambda x: apply_d(params_d, x)
        if opt.gan_type == "wgan":
            out_all = d_fn(jnp.concatenate([outs["Mer90"], outs["Mir"]], axis=0))
            o1, o2 = jnp.split(out_all, 2, axis=0)
            lossR_fake = gan_losses.g_loss_wgan(o1, o2, opt.lambda_gan, opt.ganw)
        else:
            outs_all = d_fn(jnp.concatenate([outs["Mer90"], outs["Mir"]], axis=0))
            o1 = [o[:B] for o in outs_all]
            o2 = [o[B:] for o in outs_all]
            lossR_fake = gan_losses.g_loss_lsgan(o1, o2, opt.lambda_gan, opt.ganw)

        lossR_data = opt.lambda_data * diffRender.recon_data(
            outs["Xer"], Xa, no_mask=opt.bg, contour=opt.lambda_contour)
        if opt.hmr > 0 and Va is not None:
            cham, _ = chamfer_distance(outs["Ae"]["vertices"], Va)
            lossR_data = lossR_data + opt.hmr * cham

        lossR_reg, lossR_flip, lossR_IC = regularization(
            diffRender, outs["Ae"], outs["Ai"], outs["Aire"], opt)

        lossR_dis = 0.0
        if opt.dis1 > 0:
            Ae, Af = outs["Ae"], outs["Ae_fliplr"]
            l_text = jnp.mean(jnp.abs(_fliplr(Af["textures"]) - Ae["textures"]))
            Na = Ae["vertices"] * jnp.array([-1.0, 1.0, 1.0])
            if opt.chamfer:
                l_shape, _ = chamfer_distance(Af["vertices"], Na)
            else:
                l_shape = jnp.mean(_sn(Af["vertices"].reshape(B, -1) - Na.reshape(B, -1)))
            lossR_dis += opt.dis1 * (l_text + l_shape)
        if opt.dis2 > 0:
            Ae, Aj = outs["Ae"], outs["Ae_jitter"]
            if opt.chamfer:
                l_shape, _ = chamfer_distance(Aj["vertices"], Ae["vertices"])
            else:
                l_shape = jnp.mean(_sn(Aj["delta_vertices"].reshape(B, -1)
                        - Ae["delta_vertices"].reshape(B, -1)))
            l_cam = (opt.azim * jnp.mean((angle2xy(Aj["azimuths"])
                                          - angle2xy(Ae["azimuths"])) ** 2)
                     + jnp.mean((angle2xy(Aj["elevations"])
                                 - angle2xy(Ae["elevations"])) ** 2)
                     + jnp.mean((Aj["distances"] - Ae["distances"]) ** 2)
                     + jnp.mean((Aj["biases"] - Ae["biases"]) ** 2))
            lossR_dis += opt.dis2 * (l_cam + l_shape)

        lossR_LC = outs.get("lossR_LC", 0.0)
        lossR = (lossR_fake + lossR_reg + lossR_flip + lossR_data + lossR_IC
                 + lossR_dis + lossR_LC) * warm_up
        metrics = {
            "lossR": lossR, "lossR_fake": lossR_fake, "lossR_reg": lossR_reg,
            "lossR_flip": lossR_flip, "lossR_data": lossR_data,
            "lossR_IC": lossR_IC, "lossR_dis": jnp.asarray(lossR_dis),
            "lossR_LC": jnp.asarray(lossR_LC),
        }
        # rasterizer capacity-overflow diagnostic (v4 banded kernel): total
        # (band, face) pairs dropped this step across all renders; must stay
        # 0 — a nonzero count means band_capacity needs raising
        if "dropped_faces" in outs:
            metrics["dropped_faces"] = outs["dropped_faces"]
        if "dropped_tex_chunks" in outs:
            metrics["dropped_tex_chunks"] = outs["dropped_tex_chunks"]
        return lossR, metrics

    def train_step(state, Xa, rng, lr_e, lr_d, warm_up, train_shape, Va=None):
        k_fwd, k_gp = jax.random.split(rng)

        # ---- single encoder+render forward with saved linearization
        (outs, new_stats), vjp_fn = _vjp_aux(
            e_outputs, state.params_e, state.stats_e, Xa, state.template,
            k_fwd, train_shape)

        # ---- D update (reference trainer.py:243-418)
        (lossD, d_aux), gradD = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params_d, outs, k_gp, warm_up)
        updD, new_opt_d = opt_d.update(gradD, state.opt_state_d, state.params_d)
        new_params_d = apply_updates_scaled(state.params_d, updD, lr_d)

        # ---- G update through the saved forward (reference trainer.py:420-518)
        (lossR, e_metrics), g_outs = jax.value_and_grad(
            lambda o: e_loss_fn(o, new_params_d, Xa, Va, warm_up),
            has_aux=True)(outs)
        (gradE,) = vjp_fn(g_outs)
        updE, new_opt_e = opt_e.update(gradE, state.opt_state_e, state.params_e)
        new_params_e = apply_updates_scaled(state.params_e, updE, lr_e)

        # ---- non-finite-gradient guard: one NaN/Inf gradient step would
        # poison params (and Adam moments) forever — a 4k-step round-4 run
        # NaN'd at step ~1150 and never recovered because zero-coverage
        # renders have no gradient path back.  Skip the side whose gradient
        # is non-finite, keep the other; expose skip flags + grad norms as
        # metrics so runs can log the spike that triggered it.  (The
        # reference inherits the same failure mode — trainer.py:420-518 has
        # no guard — this is a robustness improvement, not a semantic
        # change: finite-grad steps are bit-identical.)
        finD = _all_finite(gradD)
        finE = jnp.logical_and(_all_finite(gradE), _all_finite(new_stats))
        # keep/skip via lax.cond, NOT per-leaf jnp.where: XLA's fusion pass
        # re-materializes the whole ~400-op reduce_and chain behind each
        # guard scalar INSIDE every per-leaf select fusion it feeds —
        # measured 421k of 1.09M instructions in the optimized 8-dev dryrun
        # module (19x the lowered size), the dominant cost of the 1-core
        # gate compile (an optimization_barrier did not help: the CPU
        # pipeline expands barriers before fusion).  Conditional bodies are
        # un-fusable identity tuples, and at run time only one branch
        # executes (docs/DESIGN.md round 5).
        new_params_d, new_opt_d = jax.lax.cond(
            finD,
            lambda: (new_params_d, new_opt_d),
            lambda: (state.params_d, state.opt_state_d))
        new_params_e, new_opt_e, new_stats = jax.lax.cond(
            finE,
            lambda: (new_params_e, new_opt_e, new_stats),
            lambda: (state.params_e, state.opt_state_e, state.stats_e))

        metrics = {"lossD": lossD, "lossD_real": d_aux[0],
                   "lossD_fake": d_aux[1], "lossD_gp": d_aux[2],
                   "gnormE": _gnorm(gradE), "gnormD": _gnorm(gradD),
                   "skipE": 1.0 - finE.astype(jnp.float32),
                   "skipD": 1.0 - finD.astype(jnp.float32), **e_metrics}
        new_state = state.replace(
            params_e=new_params_e, stats_e=new_stats, params_d=new_params_d,
            opt_state_e=new_opt_e, opt_state_d=new_opt_d,
            step=state.step + 1)
        return new_state, metrics, outs["Xer"], outs["Xir"]

    if steps_per_call > 1:
        N = int(steps_per_call)

        def train_scan(state, Xa_stack, rngs, lr_e, lr_d, warm_ups,
                       train_shape, Va_stack=None):
            """N sequential full D+G steps in ONE dispatch (lax.scan).

            Xa_stack (N, B, H, W, 4); rngs (N,) key batch; warm_ups (N,).
            Returns the final state plus EVERY step's metrics stacked (N,)
            so the caller keeps the reference's per-iteration print cadence,
            and the LAST step's Xer/Xir for artifact dumps."""
            if Va_stack is None:
                xs = (Xa_stack, rngs, warm_ups)

                def body(st, x):
                    Xa_i, rng_i, warm_i = x
                    st2, metrics, Xer, Xir = train_step(
                        st, Xa_i, rng_i, lr_e, lr_d, warm_i, train_shape)
                    return st2, (metrics, Xer, Xir)
            else:
                xs = (Xa_stack, rngs, warm_ups, Va_stack)

                def body(st, x):
                    Xa_i, rng_i, warm_i, Va_i = x
                    st2, metrics, Xer, Xir = train_step(
                        st, Xa_i, rng_i, lr_e, lr_d, warm_i, train_shape,
                        Va_i)
                    return st2, (metrics, Xer, Xir)

            state, (ms, Xers, Xirs) = jax.lax.scan(body, state, xs, length=N)
            return state, ms, Xers[-1], Xirs[-1]

        return jax.jit(train_scan, static_argnames=("train_shape",),
                       donate_argnums=(0,) if donate else ())

    return jax.jit(train_step, static_argnames=("train_shape",),
                   donate_argnums=(0,) if donate else ())


def _all_finite(tree):
    """Scalar bool: every leaf of the tree is entirely finite."""
    leaves = [jnp.all(jnp.isfinite(l))
              for l in jax.tree_util.tree_leaves(tree)]
    return jnp.all(jnp.stack(leaves)) if leaves else jnp.asarray(True)


def _gnorm(tree):
    """Global L2 norm over all leaves (float32)."""
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in jax.tree_util.tree_leaves(tree)))


def _select(pred, a, b):
    """Per-leaf jnp.where(pred, a, b) over two same-structure trees."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)


def _vjp_aux(f, params, *args):
    """jax.vjp with auxiliary output: f(params, *args) -> (outs, aux)."""
    (outs, aux), vjp_fn = jax.vjp(lambda p: f(p, *args), params, has_aux=False)
    # vjp over the (outs, aux) pair: wrap so aux gets zero cotangent
    def vjp_outs(g_outs):
        zero_aux = jax.tree_util.tree_map(jnp.zeros_like, aux)
        return vjp_fn((g_outs, zero_aux))

    return (outs, aux), vjp_outs
