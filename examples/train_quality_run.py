"""Quality-evidence run (VERDICT round-1 item 4): multi-thousand-step
training on the synthetic-ellipsoid dataset (ground truth by construction)
with a held-out eval set, recording SSIM / mask-IoU / loss curves and final
rendered artifacts into RESULTS/.

    python examples/train_quality_run.py --steps 3000 --size 64 --batch 16

Writes RESULTS/curves.csv, RESULTS/final_mesh.obj, RESULTS/samples.png and
appends a summary row the RESULTS.md report cites.  The metric cadence
mirrors the reference's per-epoch eval (reference trainer.py:771-813).
"""
import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

if os.environ.get("MAGICMIRROR_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from train_synthetic import make_synthetic_batch  # noqa: E402


def _write_artifacts(args, dr, state, eval_batch, rgba, vertices):
    """Reconstruction grid + predicted/template meshes (overwrites).

    ``vertices`` comes straight out of the jitted eval_metrics pass (advisor
    r3: re-running an un-jitted netE.apply here doubled the snapshot cost
    through the remote-dispatch tunnel)."""
    from magicmirror.eval.images import save_array_image
    from magicmirror.geometry.obj_io import save_mesh
    n = min(8, args.batch)
    gt = np.asarray(eval_batch[:n, :, :, :3])
    gtm = np.asarray(eval_batch[:n, :, :, 3:4])
    gt_white = gt * gtm + (1 - gtm)
    rec = np.asarray(rgba[:n, :, :, :3])
    grid = np.concatenate([np.concatenate(list(gt_white), axis=1),
                           np.concatenate(list(rec), axis=1)], axis=0)
    save_array_image(grid, os.path.join(args.out, "samples.png"))
    save_mesh(os.path.join(args.out, "final_mesh.obj"),
              np.asarray(vertices[0]), np.asarray(dr.faces), dr.uvs)
    save_mesh(os.path.join(args.out, "template_evolved.obj"),
              np.asarray(state.template), np.asarray(dr.faces), dr.uvs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval_every", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default="RESULTS")
    # round-3 additions (VERDICT r2 item 5): recipe backbones (from-scratch
    # parity mode), EM + SWA cadences, and a real data budget — the round-2
    # run recycled 16 fixed batches, which is the prime suspect for the
    # post-6k eval decay (memorization)
    ap.add_argument("--n_batches", type=int, default=64,
                    help="distinct synthetic train batches to cycle")
    ap.add_argument("--pretrains", default="none")
    ap.add_argument("--pretrainc", default="none")
    ap.add_argument("--pretraint", default="none")
    ap.add_argument("--em_every", type=int, default=0,
                    help="EM template update every N steps (0 = off)")
    ap.add_argument("--swa_start", type=int, default=-1,
                    help="step to start SWA averaging (-1 = off)")
    ap.add_argument("--swa_every", type=int, default=500)
    ap.add_argument("--steps_per_call", type=int, default=1,
                    help="iterations per jitted dispatch (lax.scan; "
                    "amortizes remote-dispatch overhead).  Must divide "
                    "eval/em/swa cadences; lr is held constant within a "
                    "group (<=spc/steps relative drift)")
    args = ap.parse_args()
    spc = max(1, args.steps_per_call)
    for name, cad in (("eval_every", args.eval_every),
                      ("em_every", args.em_every),
                      ("swa_every", args.swa_every)):
        assert cad % spc == 0 or cad == 0, (
            f"--steps_per_call must divide --{name}")
    assert args.steps % spc == 0, "--steps_per_call must divide --steps"

    from magicmirror.configs.flags import build_parser
    from magicmirror.eval.metrics import mask_iou_metric, ssim
    from magicmirror.models.attribute_encoder import AttributeEncoder
    from magicmirror.models.discriminators import Discriminator
    from magicmirror.render.renderer import DiffRender
    from magicmirror.train.optim import make_optimizer_d, make_optimizer_e
    from magicmirror.train.state import create_train_state
    from magicmirror.train.train_step import make_train_step

    opt = build_parser().parse_args([])
    opt.imageSize = args.size
    opt.batchSize = args.batch
    opt.pretrains = args.pretrains
    opt.pretrainc = args.pretrainc
    opt.pretraint = args.pretraint
    opt.warm_epoch = 1

    template = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "template", "sphere.obj")
    dr = DiffRender(template, args.size, ratio=1.0)
    netE = AttributeEncoder(
        num_vertices=dr.num_vertices, azi_scope=opt.azi_scope,
        elev_range=opt.elev_range, dist_range=opt.dist_range,
        pretraint=args.pretraint, pretrainc=args.pretrainc,
        pretrains=args.pretrains, droprate=opt.droprate, ratio=1.0)
    netD = Discriminator(nc=3, nf=16)
    opt_e, opt_d = make_optimizer_e(), make_optimizer_d()
    lpl = dr.vertices_laplacian_matrix
    sample = jnp.zeros((args.batch, args.size, args.size, 4), jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), netE, netD, opt_e,
                               opt_d, sample, dr.vertices_init, lpl)
    step = make_train_step(opt, dr, netE, netD, opt_e, opt_d, lpl,
                           donate=False, steps_per_call=spc)

    # device-resident dataset, stored bf16 (64 batches at 128²/b32 would be
    # 8.6 GB in f32 — half that in bf16 leaves room for activations); each
    # step casts its group back to f32 (the jitted step's input dtype)
    train_batches = [
        jnp.asarray(make_synthetic_batch(dr, s, args.batch, args.size),
                    jnp.bfloat16)
        for s in range(args.n_batches)]
    eval_batch = jnp.asarray(
        make_synthetic_batch(dr, 999999, args.batch, args.size))

    @jax.jit
    def eval_metrics(state, Xa):
        att = netE.apply(
            {"params": state.params_e, "batch_stats": state.stats_e},
            Xa, state.template, lpl, 0, train=False)
        rgba, att = dr.render(**att)
        pred_rgb, pred_mask = rgba[..., :3], rgba[..., 3]
        gt_rgb, gt_mask = Xa[..., :3], Xa[..., 3]
        white = gt_rgb * gt_mask[..., None] + (1 - gt_mask[..., None])
        diag = dict(dist=jnp.mean(att["distances"]),
                    elev=jnp.mean(att["elevations"]),
                    mask=jnp.mean(pred_mask),
                    dmax=jnp.max(jnp.abs(att["delta_vertices"])))
        return (ssim(pred_rgb, white), mask_iou_metric(pred_mask, gt_mask),
                rgba, diag, att["vertices"])

    from magicmirror.train.em_update import (apply_template_update,
                                             make_encode_sweep, select_delta)
    from magicmirror.train.state import swa_update

    encode_sweep = make_encode_sweep(netE, dr, lpl)

    os.makedirs(args.out, exist_ok=True)
    csv_path = os.path.join(args.out, "curves.csv")
    rows = []
    rng = jax.random.PRNGKey(0)
    skips = 0.0  # cumulative non-finite-grad steps skipped (train_step guard)
    t0 = time.time()
    for i in range(0, args.steps, spc):
        rng, sub = jax.random.split(rng)
        warm = min(1.0, 0.01 + i / 50.0)
        lr = args.lr * (0.5 * (1 + np.cos(np.pi * i / args.steps)))
        if spc == 1:
            state, metrics, Xer, _ = step(
                state,
                train_batches[i % len(train_batches)].astype(jnp.float32),
                sub, lr, lr, warm, 0)
            skips += float(metrics["skipE"]) + float(metrics["skipD"])
        else:
            Xa_st = jnp.stack([train_batches[(i + j) % len(train_batches)]
                               for j in range(spc)]).astype(jnp.float32)
            warms = jnp.asarray(
                [min(1.0, 0.01 + (i + j) / 50.0) for j in range(spc)],
                jnp.float32)
            state, ms, Xer, _ = step(
                state, Xa_st, jax.random.split(sub, spc), lr, lr, warms, 0)
            skips += float(jnp.sum(ms["skipE"]) + jnp.sum(ms["skipD"]))
            metrics = {k: v[-1] for k, v in ms.items()}
        # cadences below key on the group-START index i (spc=1: identical to
        # the original schedule; spc>1: each fires at the same i, evaluated
        # spc-1 steps later — group boundaries align since spc | cadence)
        if args.em_every and i > 0 and i % args.em_every == 0:
            # EM template update over the full synthetic train set
            # (reference trainer.py:979-1105 cadence, per-step granularity)
            all_v, all_d = [], []
            for tb in train_batches:
                v, d = encode_sweep(state.params_e, state.stats_e,
                                    state.template,
                                    tb.astype(jnp.float32), bool(opt.white))
                all_v.append(np.asarray(v))
                all_d.append(np.asarray(d))
            sum_delta, count = select_delta(np.concatenate(all_v),
                                            np.concatenate(all_d), opt,
                                            dr.num_vertices)
            new_t, new_em = apply_template_update(
                np.asarray(state.template), sum_delta, count,
                np.asarray(lpl), warm, float(state.em_step), opt)
            state = state.replace(template=jnp.asarray(new_t),
                                  em_step=jnp.asarray(new_em, jnp.float32))
        if (args.swa_start >= 0 and i >= args.swa_start
                and (i - args.swa_start) % args.swa_every == 0):
            state = swa_update(state)
        if i % args.eval_every == 0 or i + spc >= args.steps:
            s, iou, rgba, diag, verts = eval_metrics(state, eval_batch)
            # same metrics on a TRAIN batch: a widening train-vs-heldout gap
            # is the memorization signature suspected behind the round-2
            # post-6k decay (VERDICT r2 weak-4)
            s_tr, iou_tr, _, _, _ = eval_metrics(
                state, train_batches[0].astype(jnp.float32))
            tdrift = float(jnp.max(jnp.abs(state.template
                                           - dr.vertices_init)))
            row = dict(step=i, wall_s=round(time.time() - t0, 1),
                       ssim=round(float(s), 4), mask_iou=round(float(iou), 4),
                       ssim_train=round(float(s_tr), 4),
                       iou_train=round(float(iou_tr), 4),
                       lossR_data=round(float(metrics["lossR_data"]), 4),
                       lossR_fake=round(float(metrics["lossR_fake"]), 4),
                       lossD=round(float(metrics["lossD"]), 5),
                       dropped=int(float(metrics.get("dropped_faces", 0.0))),
                       tex_drop=int(float(
                           metrics.get("dropped_tex_chunks", 0.0))),
                       dist=round(float(diag["dist"]), 2),
                       elev=round(float(diag["elev"]), 1),
                       mask=round(float(diag["mask"]), 3),
                       dmax=round(float(diag["dmax"]), 3),
                       tdrift=round(tdrift, 4),
                       swa_n=int(state.swa_n),
                       gnormE=round(float(metrics["gnormE"]), 3),
                       skips=int(skips))
            rows.append(row)
            print(" ".join(f"{k}={v}" for k, v in row.items()), flush=True)
            with open(csv_path, "w", newline="") as fp:
                w = csv.DictWriter(fp, fieldnames=list(rows[0]))
                w.writeheader()
                w.writerows(rows)
            # periodic artifact snapshot (overwrite): a wall-clock-bounded
            # run still leaves a full evidence set, not just curves.  The
            # final iteration skips it — the post-loop block writes the same
            # artifacts from the SAME eval (advisor r3: no double pass)
            if i > 0 and i % (args.eval_every * 8) == 0 and i + spc < args.steps:
                _write_artifacts(args, dr, state, eval_batch, rgba, verts)

    # final artifacts: reuse the last in-loop eval (the last group always
    # evaluates via the `i + spc >= args.steps` clause and state is unchanged
    # since)
    _write_artifacts(args, dr, state, eval_batch, rgba, verts)
    print(f"final: ssim={float(s):.4f} mask_iou={float(iou):.4f} "
          f"({args.steps} steps, {time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
