"""Training orchestration (reference trainer.py:77-1106), TPU-native.

The epoch loop is host Python; everything per-iteration is one jitted
``train_step`` (D then G, magicmirror/train/train_step.py).  Eval renders,
JPEG round-trips, FID, checkpoints, GIF sweeps, SWA, and the EM template
update follow the reference's cadence and artifact layout:

  log/<name>/
    opts.yaml, result.txt, logs/ (tensorboard), fid/{ori,rec,inter,inter90,
    ori_mask,rec_mask}/, ckpts/{latest_ckpt,best_ckpt,epoch_*}  + best_mesh.obj,
    epoch_%03d_*.png/gif artifacts
"""
from __future__ import annotations

import os
import shutil

import numpy as np
import tqdm

import jax
import jax.numpy as jnp

from ..eval.fid import calculate_fid_given_paths
from ..eval.gifs import azimuth_sweep, distance_sweep, elevation_sweep
from ..eval.images import save_image_grid, save_images_parallel
from ..eval.metrics import mask_iou_metric, ssim
from ..eval.reports import ResultLog, SummaryLogger
from ..geometry.obj_io import save_mesh
from ..models.attribute_encoder import AttributeEncoder, make_inv_preconditioner
from ..models.discriminators import Discriminator, MSDiscriminator
from ..render.renderer import DiffRender, deep_copy
from .checkpoints import CheckpointManager
from .em_update import apply_template_update, make_encode_sweep, select_delta
from .optim import lr_schedule, make_optimizer_d, make_optimizer_e
from .state import create_train_state, swa_update
from .train_step import make_train_step


def build_models(opt, diffRender):
    """netE + netD from flags (reference trainer.py:82-125)."""
    netE = AttributeEncoder(
        num_vertices=diffRender.num_vertices, azi_scope=opt.azi_scope,
        elev_range=opt.elev_range, dist_range=opt.dist_range, nc=4, nk=opt.nk,
        nf=opt.nf, ratio=opt.ratio, makeup=opt.makeup, bg=opt.bg,
        pretraint=opt.pretraint, pretrainc=opt.pretrainc,
        pretrains=opt.pretrains, droprate=opt.droprate,
        coordconv=opt.coordconv, norm=opt.norm, nolpl=opt.nolpl, inv=opt.inv,
        lambda_lc=opt.lambda_lc, num_faces=diffRender.num_faces)
    dis_nc = 4 if opt.unmask == 2 else 3
    if getattr(opt, "sn_dis", 0):
        # single patch-critic output: pairs with the scalar wgan losses only
        assert opt.gan_type == "wgan", "--sn_dis requires --gan_type wgan"
        from ..models.discriminators import SNDiscriminator
        netD = SNDiscriminator(nc=dis_nc, imsize=opt.imageSize)
    elif opt.gan_type == "wgan":
        netD = Discriminator(nc=dis_nc, nf=16)
    elif opt.gan_type == "lsgan":
        netD = MSDiscriminator(nc=dis_nc, nf=16)
    else:
        raise ValueError("unknown gan type. Only lsgan or wgan is accepted.")
    return netE, netD


def _train_shape_policy(opt, it):
    """Per-iteration encoder freezing (reference trainer.py:255-269)."""
    if opt.update_shape == -1:
        return (3, 4, 5)[it % 3]
    if opt.update_shape > 0:
        return 2 if it % opt.update_shape == 0 else 1
    return 0


def _batch_images(data):
    return jnp.asarray(data["images"])


def make_eval_step(netE, diffRender, lpl, opt):
    """Jitted test-time forward: recon + random-azimuth + ±90° renders
    (reference trainer.py:702-723)."""

    def eval_step(params_e, stats_e, template, Xa, rng):
        att = netE.apply({"params": params_e, "batch_stats": stats_e},
                         Xa, template, lpl, train_shape=0, train=False)
        Xer, Ae = diffRender.render(**att)
        Ai = deep_copy(Ae)
        Ai2 = deep_copy(Ae)
        Ae90 = deep_copy(Ae)
        Ae270 = deep_copy(Ae)
        B = Xa.shape[0]
        Ai["azimuths"] = -jax.random.uniform(
            rng, (B,), minval=-opt.azi_scope / 2, maxval=opt.azi_scope / 2)
        az2 = Ai["azimuths"] + 90.0
        Ai2["azimuths"] = jnp.where(az2 > 180.0, az2 - 360.0, az2)
        Ae90["azimuths"] = Ae["azimuths"] + 90.0
        Ae270["azimuths"] = Ae["azimuths"] - 90.0
        Xir, Ai = diffRender.render(**Ai)
        Xir2, _ = diffRender.render(**Ai2)
        Xer90, _ = diffRender.render(**Ae90)
        Xer270, _ = diffRender.render(**Ae270)
        return Xer, Xir, Xir2, Xer90, Xer270, Ae

    return jax.jit(eval_step)


def run_test_eval(opt, state, eval_step, test_dataloader, dirs, epoch,
                  use_swa=False):
    """Render the test set and dump eval images (reference trainer.py:697-769).
    Returns nothing; metrics are computed from the saved files afterwards."""
    ori_dir, rec_dir, inter_dir, inter90_dir, ori_mask_dir, rec_mask_dir = dirs
    params = state.swa_params if use_swa else state.params_e
    stats = state.swa_stats if use_swa else state.stats_e
    rng = jax.random.PRNGKey(1234 + epoch)
    to_save = []
    for i, data in enumerate(tqdm.tqdm(test_dataloader)):
        Xa = _batch_images(data)
        paths = data["path"]
        rng, sub = jax.random.split(rng)
        Xer, Xir, Xir2, Xer90, Xer270, _ = eval_step(
            params, stats, state.template, Xa, sub)
        Xa_np, Xer, Xir, Xir2, Xer90, Xer270 = [
            np.asarray(t) for t in (Xa, Xer, Xir, Xir2, Xer90, Xer270)]
        for b in range(len(paths)):
            name = os.path.basename(paths[b])
            to_save.append((Xer[b, :, :, :3], os.path.join(rec_dir, name)))
            to_save.append((Xir[b, :, :, :3], os.path.join(inter_dir, name)))
            to_save.append((Xir2[b, :, :, :3], os.path.join(inter_dir, "2+" + name)))
            to_save.append((Xer90[b, :, :, :3], os.path.join(inter90_dir, name)))
            to_save.append((Xer270[b, :, :, :3], os.path.join(inter90_dir, "2+" + name)))
            to_save.append((Xer[b, :, :, 3], os.path.join(rec_mask_dir, name)))
            if epoch == 0 or not os.listdir(ori_dir):
                xa = Xa_np[b]
                rgb = xa[..., :3]
                m = xa[..., 3:4]
                if opt.bg:
                    rgb = rgb * m + (1 - m)
                to_save.append((rgb, os.path.join(ori_dir, name)))
                to_save.append((xa[..., 3], os.path.join(ori_mask_dir, name)))
    save_images_parallel(to_save, workers=4)


def file_metrics(opt, dirs):
    """SSIM + mask-IoU over the SAVED files — the JPEG/PNG round-trip is part
    of the metric (reference trainer.py:771-796; SURVEY.md §7 trap 5)."""
    from PIL import Image

    ori_dir, rec_dir, _, _, ori_mask_dir, rec_mask_dir = dirs
    size = (opt.imageSize, round(opt.imageSize * opt.ratio))
    ssim_scores, iou_scores = [], []
    for name in sorted(os.listdir(ori_dir)):
        if not name.lower().endswith(("png", "jpg")):
            continue
        rec_path = os.path.join(rec_dir, name)
        if not os.path.isfile(rec_path):
            continue
        ori = np.asarray(Image.open(os.path.join(ori_dir, name)).convert("RGB")
                         .resize(size), np.float32)[None] / 255.0
        rec = np.asarray(Image.open(rec_path).convert("RGB").resize(size),
                         np.float32)[None] / 255.0
        ssim_scores.append(float(ssim(jnp.asarray(ori), jnp.asarray(rec))))
        ori_m = np.asarray(Image.open(os.path.join(ori_mask_dir, name))
                           .convert("L").resize(size), np.float32)[None] / 255.0
        rec_m = np.asarray(Image.open(os.path.join(rec_mask_dir, name))
                           .convert("L").resize(size), np.float32)[None] / 255.0
        iou_scores.append(float(mask_iou_metric(jnp.asarray(ori_m),
                                                jnp.asarray(rec_m))))
    return (float(np.mean(ssim_scores)) if ssim_scores else 0.0,
            float(np.mean(iou_scores)) if iou_scores else 0.0)


def trainer(opt, train_dataloader, test_dataloader, train_noaug_dataloader):
    outf = opt.outf
    # reproducibility hygiene: snapshot the training code into the run dir
    # (reference trainer.py:79-80 backs up trainer.py/networks.py)
    import shutil

    for src in ("train/trainer.py", "train/train_step.py", "render/renderer.py"):
        path = os.path.join(os.path.dirname(os.path.dirname(__file__)), src)
        if os.path.isfile(path):
            shutil.copy(path, os.path.join(outf, os.path.basename(path)))

    if getattr(opt, "fp16", False):
        from ..models.blocks import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)
        print("bf16 compute policy enabled (--fp16)")
    diffRender = DiffRender(mesh_name=opt.template_path,
                            image_size=opt.imageSize, ratio=opt.ratio,
                            init_ellipsoid=opt.ellipsoid,
                            image_weight=opt.image_weight,
                            lambda_lpl=opt.lambda_lpl,
                            lambda_flat=opt.lambda_flat,
                            backend=getattr(opt, "raster_backend", "auto"),
                            soft_mode=getattr(opt, "soft_mode", "line"),
                            band_capacity=(getattr(opt, "band_capacity", 0)
                                           or None))
    netE, netD = build_models(opt, diffRender)
    lpl = diffRender.vertices_laplacian_matrix
    precond_M = (jnp.asarray(make_inv_preconditioner(np.asarray(lpl), opt.inv))
                 if opt.inv > 0 else None)

    opt_e = make_optimizer_e(adamw=opt.adamw, beta1=opt.beta1, wd=opt.wd,
                             amsgrad=opt.amsgrad)
    opt_d = make_optimizer_d(beta1=opt.beta1, wd=opt.wd, amsgrad=opt.amsgrad)

    rng = jax.random.PRNGKey(opt.manualSeed)
    rng, k_init = jax.random.split(rng)
    H = round(opt.ratio * opt.imageSize)
    sample = jnp.zeros((opt.batchSize, H, opt.imageSize, 4), jnp.float32)
    state = create_train_state(k_init, netE, netD, opt_e, opt_d, sample,
                               diffRender.vertices_init, lpl,
                               em_step=opt.em_step)

    # SPMD data parallelism over all local chips (replaces the reference's
    # DataParallel, trainer.py:94-95): state replicated, batch axis sharded;
    # XLA inserts the gradient all-reduce over ICI via sharding propagation
    mesh = None
    if getattr(opt, "multigpus", False):
        from ..dist.mesh import (batch_sharding, make_device_mesh,
                                 shard_train_state)

        import jax as _jax

        if len(_jax.devices()) > 1:
            mesh = make_device_mesh()
            state = shard_train_state(mesh, state)
            print(f"data-parallel mesh over {len(_jax.devices())} devices")

    def to_device(batch_images):
        if mesh is not None:
            # single-host: device_put with batch sharding; multi-host: the
            # local per-process slice assembles into the GLOBAL batch array
            from ..dist.mesh import shard_global_batch

            return shard_global_batch(mesh, batch_images)
        return batch_images

    ckpt = CheckpointManager(os.path.join(outf, "ckpts"))
    start_epoch = 0
    if opt.resume:
        payload = ckpt.restore("latest_ckpt", state)
        if payload is not None:
            state = payload["state"]
            start_epoch = int(payload["epoch"])
            print(f"=> loaded checkpoint (epoch {start_epoch})")
        else:
            print("=> no checkpoint can be found")

    dirs = tuple(os.path.join(outf, "fid", d) for d in
                 ("ori", "rec", "inter", "inter90", "ori_mask", "rec_mask"))
    for d in dirs:
        os.makedirs(d, exist_ok=True)

    train_step = make_train_step(opt, diffRender, netE, netD, opt_e, opt_d,
                                 lpl, precond_M=precond_M,
                                 donate=getattr(opt, "donate_state", False))
    # --steps_per_call N > 1: a scanned step executes N iterations per
    # dispatch, amortizing the per-step host overhead of the remote-execution
    # path (docs/DESIGN.md train-step table).  The 1-step fn above still
    # handles ragged tails and train_shape changes mid-group.
    spc = max(1, int(getattr(opt, "steps_per_call", 1)))
    scan_step = None if spc == 1 else make_train_step(
        opt, diffRender, netE, netD, opt_e, opt_d, lpl, precond_M=precond_M,
        donate=getattr(opt, "donate_state", False), steps_per_call=spc)
    eval_step = make_eval_step(netE, diffRender, lpl, opt)
    encode_sweep = make_encode_sweep(netE, diffRender, lpl)

    summary = SummaryLogger(os.path.join(outf, "logs"))
    result = ResultLog(os.path.join(outf, "result.txt"))

    # multi-host: every process runs the sharded train/eval compute, but only
    # process 0 writes artifacts (grids, gifs, result.txt, checkpoints) and
    # makes the best-checkpoint decision — concurrent writers would clobber
    # each other and per-process metrics could diverge
    is_main = jax.process_index() == 0

    best_fid = 9999.0
    warm_up = 0.01
    warm_iteration = len(train_dataloader) * opt.warm_epoch
    print("Model will warm up in %d iterations" % warm_iteration)

    def to_device_stacked(x):
        """(N, B, ...) host array -> device, batch axis 1 sharded."""
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P(None, "data"))
            if jax.process_count() == 1:
                return jax.device_put(jnp.asarray(x), sh)
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jnp.asarray(x)

    def print_iter(epoch, it, n_iters, m):
        print("Name:", outf)
        print("[%d/%d][%d/%d] lossD: %.4f lossR: %.4f "
              "(fake %.4f reg %.4f data %.4f IC %.4f dis %.4f)" % (
                  epoch, opt.niter, it, n_iters,
                  m["lossD"], m["lossR"], m["lossR_fake"],
                  m["lossR_reg"], m["lossR_data"], m["lossR_IC"],
                  m["lossR_dis"]))

    last_batch = None
    last_Xer = last_Xir = None
    last_att = None
    for epoch in range(start_epoch, opt.niter + 1):
        lr_e = lr_schedule(opt.scheduler, epoch, opt.niter, opt.lr, opt.gamma)
        lr_d = lr_e
        n_iters = len(train_dataloader)
        group = []

        def flush_group():
            nonlocal state, last_batch, last_Xer, last_Xir
            if not group:
                return
            if scan_step is not None and len(group) == spc:
                Xa_st = to_device_stacked(np.stack([g["Xa"] for g in group]))
                rngs = jnp.stack([g["rng"] for g in group])
                warms = jnp.asarray([g["warm"] for g in group], jnp.float32)
                Va_st = (jnp.stack([g["Va"] for g in group])
                         if group[0]["Va"] is not None else None)
                state, ms, Xer, Xir = scan_step(
                    state, Xa_st, rngs, lr_e, lr_d, warms,
                    group[0]["ts"], Va_st)
                for j, g in enumerate(group):
                    if g["it"] % 10 == 0:
                        print_iter(epoch, g["it"], n_iters,
                                   {k: float(v[j]) for k, v in ms.items()})
                last_batch = jnp.asarray(group[-1]["Xa"])
                last_Xer, last_Xir = Xer, Xir
            else:
                for g in group:
                    Xa = to_device(jnp.asarray(g["Xa"]))
                    state, metrics, Xer, Xir = train_step(
                        state, Xa, g["rng"], lr_e, lr_d, g["warm"],
                        g["ts"], g["Va"])
                    if g["it"] % 10 == 0:
                        print_iter(epoch, g["it"], n_iters,
                                   {k: float(v) for k, v in metrics.items()})
                    last_batch, last_Xer, last_Xir = Xa, Xer, Xir
            group.clear()

        for it, data in enumerate(train_dataloader):
            if epoch < opt.warm_epoch:
                warm_up = min(1.0, warm_up + 0.99 / warm_iteration)
            Va = jnp.asarray(np.stack(data["obj"])) if (
                opt.hmr > 0 and "obj" in data) else None
            train_shape = _train_shape_policy(opt, it)
            rng, sub = jax.random.split(rng)
            if group and group[-1]["ts"] != train_shape:
                flush_group()  # static train_shape changed mid-group
            group.append(dict(Xa=np.asarray(data["images"]), rng=sub,
                              warm=warm_up, ts=train_shape, Va=Va, it=it))
            if len(group) == spc:
                flush_group()
        flush_group()

        if opt.swa and epoch >= opt.swa_start and epoch % opt.swa_interval == 0:
            state = swa_update(state)
            print("How many models are fused: %d" % int(state.swa_n))

        if (opt.swa and epoch >= opt.swa_start and epoch % 20 == 0
                and int(state.swa_n) > 0):
            # re-estimate the averaged model's BN stats on the train set
            # (torch update_bn; reference trainer.py:673-676)
            print("===========Updating SWA BatchNorm===========")
            from .state import make_update_bn

            update_bn_fn = make_update_bn(netE, lpl)
            rng, sub = jax.random.split(rng)
            new_swa_stats = update_bn_fn(state.swa_params, state.swa_stats,
                                         state.template, train_dataloader,
                                         sub, max_batches=50)
            state = state.replace(swa_stats=new_swa_stats)

        # ---- periodic artifacts (reference trainer.py:546-671)
        if epoch % 10 == 0 and last_batch is not None and is_main:
            Xa_np = np.asarray(last_batch)
            Xer_np = np.asarray(last_Xer)
            Xir_np = np.asarray(last_Xir)
            B = Xa_np.shape[0]
            perm_a = np.random.permutation(B)
            perm_b = np.random.permutation(B)
            for tag, img in (("randperm_Xa", Xa_np[perm_a, :, :, :3]),
                             ("randperm_Xb", Xa_np[perm_b, :, :, :3]),
                             ("Xa", Xa_np[:, :, :, :3]),
                             ("Xer", Xer_np[:, :, :, :3]),
                             ("Xir", Xir_np[:, :, :, :3])):
                save_image_grid(img, "%s/epoch_%03d_Iter_%04d_%s.png" % (
                    outf, epoch, 0, tag), normalize=True)
                save_image_grid(img, "%s/current_%s.png" % (outf, tag),
                                normalize=True)

            # recon attributes of the last batch for meshes/gifs/textures
            att = eval_step(state.params_e, state.stats_e, state.template,
                            jnp.asarray(Xa_np), jax.random.PRNGKey(epoch))[-1]
            att = deep_copy(att, detach=True)
            tex0 = np.asarray(att["textures"][0])
            save_image_grid(tex0[None], "%s/current_mesh_recon.png" % outf)
            save_image_grid(tex0[None], "%s/epoch_%03d_mesh_recon.png" % (outf, epoch))
            faces = np.asarray(diffRender.faces)
            uvs = diffRender.uvs
            save_mesh("%s/current_mesh_recon.obj" % outf,
                      np.asarray(att["vertices"][0]), faces, uvs)
            save_mesh("%s/epoch_%03d_template.obj" % (outf, epoch),
                      np.asarray(state.template), faces, uvs)

            def render_host(**a):
                out, aa = diffRender.render(**{
                    k: (jnp.asarray(v) if v is not None else None)
                    for k, v in a.items()})
                return np.asarray(out), aa

            print("===========Saving Gif-Azi===========")
            azimuth_sweep(render_host, att,
                          os.path.join(outf, "epoch_%03d_rotation.gif" % epoch),
                          azi_scope=opt.azi_scope,
                          copy_to=os.path.join(outf, "current_rotation.gif"))
            print("===========Saving Gif-Y===========")
            elevation_sweep(render_host, att,
                            os.path.join(outf, "epoch_%03d_rotation_ele.gif" % epoch),
                            elev_range=opt.elev_range,
                            copy_to=os.path.join(outf, "current_rotation_ele.gif"))
            print("===========Saving Gif-Dist===========")
            distance_sweep(render_host, att,
                           os.path.join(outf, "epoch_%03d_rotation_dist.gif" % epoch),
                           dist_range=opt.dist_range,
                           copy_to=os.path.join(outf, "current_rotation_dist.gif"))

        # ---- test eval + FID + checkpoints (reference trainer.py:697-836)
        if epoch % 20 == 0:
            for use_swa in ([False, True] if (opt.swa and epoch >= opt.swa_start)
                            else [False]):
                tag = " (SWA)" if use_swa else ""
                print("===========Generating Test Images%s===========" % tag)
                # every process renders+saves its own disjoint test shard
                # (filenames are disjoint); process 0 then computes the file
                # metrics over the union and owns the checkpoint decision
                run_test_eval(opt, state, eval_step, test_dataloader, dirs,
                              epoch, use_swa=use_swa)
                if jax.process_count() > 1:
                    from jax.experimental import multihost_utils

                    multihost_utils.sync_global_devices("eval_images_saved")
                if not is_main:
                    continue
                print("===========Evaluating SSIM & MaskIoU===========")
                s, iou = file_metrics(opt, dirs)
                print("Test recon ssim: %0.3f" % s)
                print("Test recon MaskIoU: %0.3f" % iou)
                print("===========Evaluating FID Score===========")
                ori, rec, inter, inter90 = dirs[0], dirs[1], dirs[2], dirs[3]
                fid_recon = calculate_fid_given_paths([ori, rec], 64)
                fid_inter = calculate_fid_given_paths([ori, inter], 64)
                fid_90 = calculate_fid_given_paths([ori, inter90], 64)
                print("Epoch %03d fid recon/rot/rot90: %0.2f %0.2f %0.2f"
                      % (epoch, fid_recon, fid_inter, fid_90))
                summary.add_scalar("Test/fid_recon", fid_recon, epoch)
                summary.add_scalar("Test/fid_inter", fid_inter, epoch)
                summary.add_scalar("Test/fid_90", fid_90, epoch)
                result.write("Epoch %03d recon ssim: %0.3f%s" % (epoch, s, tag))
                result.write("Epoch %03d recon MaskIoU: %0.3f%s" % (epoch, iou, tag))
                result.write("Epoch %03d Test recon fid: %0.2f%s" % (epoch, fid_recon, tag))
                result.write("Epoch %03d Test rotation fid: %0.2f%s" % (epoch, fid_inter, tag))
                result.write("Epoch %03d Test rotate90/270 fid: %0.2f%s" % (epoch, fid_90, tag))

                print("===========Saving Best Snapshot===========")
                ckpt.save("latest_ckpt", state, epoch)
                # best-checkpoint criterion: fid_inter (reference
                # trainer.py:966-977) — but ONLY with real inception weights.
                # With the random-init fallback FID is noise, so selecting on
                # it would pick an arbitrary checkpoint; fall back to
                # mask-IoU (higher is better) and say so loudly.
                from ..eval.inception import fid_weights_available

                if fid_weights_available():
                    crit, better = fid_inter, fid_inter < best_fid
                else:
                    print("ERROR: FID weights unavailable — best-checkpoint "
                          "selection keyed on mask-IoU instead of fid_inter "
                          "(convert weights with "
                          "magicmirror/eval/convert_fid_weights.py)")
                    crit, better = -iou, -iou < best_fid
                if better:
                    ckpt.save("best_ckpt", state, epoch)
                    ckpt.save_best_mesh(state.template,
                                        np.asarray(diffRender.faces),
                                        diffRender.uvs)
                    best_fid = crit

        # ---- EM template update (reference trainer.py:979-1105)
        if opt.em > 0 and epoch % opt.em_gap == 0 and epoch < opt.swa_start:
            print("===========Updating template===========")
            all_v, all_d = [], []
            for data in train_noaug_dataloader:
                Xa = _batch_images(data)
                v, d = encode_sweep(state.params_e, state.stats_e,
                                    state.template, Xa, bool(opt.white))
                all_v.append(np.asarray(v))
                all_d.append(np.asarray(d))
            if all_v:
                all_v = np.concatenate(all_v)
                all_d = np.concatenate(all_d)
                if jax.process_count() > 1:
                    # the noaug loader is sharded per process: gather every
                    # shard's encodings so select_delta sees the full train
                    # set and all ranks apply the IDENTICAL template update
                    # (per-shard selections would silently diverge the
                    # replicated train state across hosts)
                    from jax.experimental import multihost_utils

                    all_v = np.asarray(
                        multihost_utils.process_allgather(all_v)
                    ).reshape((-1,) + all_v.shape[1:])
                    all_d = np.asarray(
                        multihost_utils.process_allgather(all_d)
                    ).reshape((-1,) + all_d.shape[1:])
                sum_delta, count = select_delta(all_v, all_d, opt,
                                                diffRender.num_vertices)
                print("The template mesh fuses %d / %d meshes" % (count, len(all_v)))
                new_template, new_em = apply_template_update(
                    np.asarray(state.template), sum_delta, count,
                    np.asarray(lpl), warm_up, float(state.em_step), opt)
                state = state.replace(template=jnp.asarray(new_template),
                                      em_step=jnp.asarray(new_em, jnp.float32))
                if opt.update_bn:
                    # refresh the LIVE encoder's BN stats after the template
                    # rewrite — the running stats were estimated against the
                    # old template (reference trainer.py:1105)
                    print("===========Updating BatchNorm after EM===========")
                    from .state import make_update_bn

                    update_bn_fn = make_update_bn(netE, lpl)
                    rng, sub = jax.random.split(rng)
                    new_stats = update_bn_fn(state.params_e, state.stats_e,
                                             state.template,
                                             train_dataloader, sub,
                                             max_batches=50)
                    state = state.replace(stats_e=new_stats)

    summary.close()
    return state
