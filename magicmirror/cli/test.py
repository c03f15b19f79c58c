"""Metric evaluation entry point (reference test.py).

    python test.py --name <model>

Flags are force-overridden from ``log/<name>/opts.yaml`` (reference
test.py:139-167); the dataset is dispatched on a substring of the run name
("MKT"/"ATR2"/"ATR"/else CUB, reference test.py:174-194) and the evolved
template re-injected from ``ckpts/best_mesh.obj`` (reference test.py:220-223).
"""
from __future__ import annotations

import os

import numpy as np
import tqdm

import jax
import jax.numpy as jnp

from ..configs.flags import build_parser, load_options
from ..data.atr import ATRDataset
from ..data.atr2 import ATR2Dataset
from ..data.cub import CUBDataset
from ..data.loader import DataLoader
from ..data.market import MarketDataset
from ..eval.fid import calculate_fid_given_paths
from ..eval.images import save_images_parallel
from ..eval.reports import ResultLog, save_histograms
from ..geometry import mesh as mesh_ops
from ..geometry.obj_io import load_obj
from ..render.renderer import DiffRender
from ..train.checkpoints import CheckpointManager
from ..train.optim import make_optimizer_d, make_optimizer_e
from ..train.state import create_train_state
from ..train.trainer import build_models, file_metrics, make_eval_step


def pick_dataset(opt):
    """Name-substring dispatch (reference test.py:174-194)."""
    if "MKT" in opt.name:
        return MarketDataset(opt.dataroot, opt.imageSize, train=False,
                             aug=False, bg=opt.bg)
    if "ATR2" in opt.name:
        return ATR2Dataset(opt.dataroot, opt.imageSize, ratio=opt.ratio,
                           train=False, aug=False, bg=opt.bg,
                           threshold=opt.threshold)
    if "ATR" in opt.name:
        return ATRDataset(opt.dataroot, opt.imageSize, train=False, aug=False,
                          bg=opt.bg)
    return CUBDataset(opt.dataroot, opt.imageSize, train=False, aug=False,
                      bg=opt.bg)


def load_eval_state(opt, diffRender, netE, netD, use_swa=True):
    """best_ckpt + best_mesh.obj template (reference test.py:206-253)."""
    opt_e = make_optimizer_e()
    opt_d = make_optimizer_d()
    H = round(opt.ratio * opt.imageSize)
    sample = jnp.zeros((1, H, opt.imageSize, 4), jnp.float32)
    lpl = diffRender.vertices_laplacian_matrix
    state = create_train_state(jax.random.PRNGKey(0), netE, netD, opt_e,
                               opt_d, sample, diffRender.vertices_init, lpl)
    ckpt = CheckpointManager(os.path.join(opt.outf, "ckpts"))
    payload = ckpt.restore("best_ckpt", state) or ckpt.restore("latest_ckpt", state)
    if payload is None:
        raise FileNotFoundError("no checkpoint under %s/ckpts" % opt.outf)
    state = payload["state"]
    best_mesh = os.path.join(opt.outf, "ckpts", "best_mesh.obj")
    if os.path.isfile(best_mesh):
        mesh = load_obj(best_mesh)
        state = state.replace(template=jnp.asarray(mesh.vertices))
        print("loaded template from", best_mesh)
    if use_swa and int(state.swa_n) > 0:
        state = state.replace(params_e=state.swa_params,
                              stats_e=state.swa_stats)
        print("using SWA weights (%d averaged)" % int(state.swa_n))
    return state


def main(argv=None):
    opt = build_parser().parse_args(argv)
    opt.outf = "./log/" + opt.name
    opt = load_options(opt)
    opt.outf = "./log/" + opt.name
    print(opt)

    dataset = pick_dataset(opt)
    loader = DataLoader(dataset, opt.batchSize, shuffle=False,
                        num_workers=opt.workers)

    diffRender = DiffRender(opt.template_path, opt.imageSize, ratio=opt.ratio,
                            init_ellipsoid=opt.ellipsoid,
                            image_weight=opt.image_weight,
                            lambda_lpl=opt.lambda_lpl,
                            lambda_flat=opt.lambda_flat)
    netE, netD = build_models(opt, diffRender)
    state = load_eval_state(opt, diffRender, netE, netD)
    eval_step = make_eval_step(netE, diffRender,
                               diffRender.vertices_laplacian_matrix, opt)

    dirs = tuple(os.path.join(opt.outf, "fid", d) for d in
                 ("ori", "rec_tmp", "inter", "inter90", "ori_mask", "rec_mask"))
    for d in dirs:
        os.makedirs(d, exist_ok=True)
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))
    ori_dir, rec_dir, inter_dir, inter90_dir, ori_mask_dir, rec_mask_dir = dirs

    stats = {"azimuths": [], "elevations": [], "distances": [],
             "bias_x": [], "bias_y": [], "delta_norm": []}
    rng = jax.random.PRNGKey(0)
    to_save = []
    for data in tqdm.tqdm(loader):
        Xa = jnp.asarray(data["images"])
        paths = data["path"]
        rng, sub = jax.random.split(rng)
        Xer, Xir, Xir2, Xer90, Xer270, Ae = eval_step(
            state.params_e, state.stats_e, state.template, Xa, sub)
        stats["azimuths"].append(np.asarray(Ae["azimuths"]))
        stats["elevations"].append(np.asarray(Ae["elevations"]))
        stats["distances"].append(np.asarray(Ae["distances"]))
        stats["bias_x"].append(np.asarray(Ae["biases"][:, 0]))
        stats["bias_y"].append(np.asarray(Ae["biases"][:, 1]))
        stats["delta_norm"].append(
            np.linalg.norm(np.asarray(Ae["delta_vertices"]), axis=-1).mean(-1))
        Xa_np = np.asarray(Xa)
        arrs = [np.asarray(t) for t in (Xer, Xir, Xir2, Xer90, Xer270)]
        for b in range(len(paths)):
            name = os.path.basename(paths[b])
            to_save += [
                (arrs[0][b, :, :, :3], os.path.join(rec_dir, name)),
                (arrs[1][b, :, :, :3], os.path.join(inter_dir, name)),
                (arrs[2][b, :, :, :3], os.path.join(inter_dir, "2+" + name)),
                (arrs[3][b, :, :, :3], os.path.join(inter90_dir, name)),
                (arrs[4][b, :, :, :3], os.path.join(inter90_dir, "2+" + name)),
                (arrs[0][b, :, :, 3], os.path.join(rec_mask_dir, name)),
                (Xa_np[b, :, :, :3], os.path.join(ori_dir, name)),
                (Xa_np[b, :, :, 3], os.path.join(ori_mask_dir, name)),
            ]
    save_images_parallel(to_save, workers=4)
    stats = {k: np.concatenate(v) for k, v in stats.items()}
    save_histograms(stats, os.path.join(opt.outf, "hist.png"))

    # CUB evaluates at 2x resolution (reference test.py:440-442)
    class _O:  # local shim so file_metrics reads size from here
        pass

    mo = _O()
    mo.imageSize = opt.imageSize * (2 if "ATR" not in opt.name
                                    and "MKT" not in opt.name else 1)
    mo.ratio = opt.ratio
    s, iou = file_metrics(mo, dirs)
    print("Test recon ssim: %0.3f" % s)
    print("Test recon MaskIoU: %0.3f" % iou)
    fid_recon = calculate_fid_given_paths([ori_dir, rec_dir], 64)
    fid_inter = calculate_fid_given_paths([ori_dir, inter_dir], 64)
    fid_90 = calculate_fid_given_paths([ori_dir, inter90_dir], 64)
    print("Test recon fid: %0.2f" % fid_recon)
    print("Test rotation fid: %0.2f" % fid_inter)
    print("Test rotate90/270 fid: %0.2f" % fid_90)
    result = ResultLog(os.path.join(opt.outf, "result.txt"))
    result.write("Final recon ssim: %0.3f" % s)
    result.write("Final recon MaskIoU: %0.3f" % iou)
    result.write("Final Test recon fid: %0.2f" % fid_recon)
    result.write("Final Test rotation fid: %0.2f" % fid_inter)
    result.write("Final Test rotate90/270 fid: %0.2f" % fid_90)


if __name__ == "__main__":
    main()
