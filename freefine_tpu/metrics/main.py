"""GeoBench metrics CLI — mirrors the reference evaluation entry point
(/root/reference/evaluation/metrics/main.py:85-148):

  python -m freefine_tpu.metrics.main --path results.json --task 000011100

Task string (9 chars, 1=compute): FID, IRS, HPS, BGC, SUBC, WRAP_E, MD,
FID_DINO, FID_KD — same order and semantics as the reference, including the
--level difficulty filter, --no_rotate, --3d mask-key swap and the
relative->absolute path fixup.

Checkpoint-dependent metrics (FID*, IRS, HPS, BGC, SUBC, MD) need converted
weights passed via --weights-dir; metrics whose encoder weights are missing
are reported as 'unavailable' rather than crashing, so WRAP_E (and any
subset) can always run.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp


def parse_data_rotate(data):
    """Drop cases with z-rotation (reference main.py:44-55)."""
    for da in data.values():
        for ins in da["instances"].values():
            for case_id in [
                c for c, gt in ins.items() if gt.get("edit_param", [0] * 6)[5] != 0
            ]:
                ins.pop(case_id)
    return data


def parse_data_3d(data):
    """3D eval mask/coarse key swap (reference main.py:57-66)."""
    for da in data.values():
        for ins in da["instances"].values():
            for gt in ins.values():
                gt["tgt_mask_path"] = gt["target_mask_0"]
                gt["coarse_input_path"] = gt["coarse_input_path_0"]
    return data


def make_absolute_path(data, base_dir, gen_img_key):
    keys = [
        "ori_img_path", "coarse_input_path", "ori_mask_path",
        "tgt_mask_path", gen_img_key,
    ]
    for da in data.values():
        for ins in da["instances"].values():
            for gt in ins.values():
                for k in keys:
                    if k in gt:
                        gt[k] = osp.join(base_dir, gt[k])
    return data


def _collect_paths(data, image_label):
    gen = []
    for da in data.values():
        for ins in da["instances"].values():
            for gt in ins.values():
                gen.append(gt[image_label])
    return gen


def main(argv=None):
    parser = argparse.ArgumentParser(description="GeoBench evaluation")
    parser.add_argument("--path", required=True)
    parser.add_argument("--level", default=0, type=int)
    parser.add_argument("--task", default="100111111", type=str)
    parser.add_argument("--gen_img_key", default="gen_img_path")
    parser.add_argument("--no_rotate", action="store_true")
    parser.add_argument("--3d", dest="three_d", action="store_true")
    parser.add_argument("--fid_path", default=None,
                        help="real-image dir for the FID family")
    parser.add_argument("--use_relative_path", action="store_true")
    parser.add_argument("--base_dir", default=None)
    parser.add_argument("--weights-dir", default=None,
                        help="dir with converted metric-encoder params "
                             "(clip_b32.msgpack, dino_vitb16.msgpack, "
                             "dinov2_vitb14.msgpack)")
    parser.add_argument("--sd-params", default=None,
                        help="MD: orbax SD checkpoint dir (pipeline."
                             "save_pipeline), or 'random' for a smoke run "
                             "with randomly initialised weights")
    parser.add_argument("--sd-config", default="sd21",
                        choices=["sd21", "sd15", "tiny"],
                        help="MD: pipeline config for the DIFT backbone "
                             "(sd21 matches the reference MD/dift_sd.py, "
                             "which loads stable-diffusion-2-1; tiny is "
                             "for tests/smoke runs)")
    parser.add_argument("--md-corr-dir", default=None,
                        help="MD: dir of 3D ground-truth correspondence "
                             ".npy files (default: derived from the "
                             "generated-image path like the reference)")
    args = parser.parse_args(argv)

    from freefine_tpu.data.geobench import filter_by_level

    data = json.load(open(args.path))
    if args.level:
        data = filter_by_level(data, args.level)
    if args.no_rotate:
        data = parse_data_rotate(data)
    if args.three_d:
        data = parse_data_3d(data)
    if args.use_relative_path:
        assert args.base_dir, "--base_dir required with --use_relative_path"
        data = make_absolute_path(data, args.base_dir, args.gen_img_key)

    label = args.gen_img_key
    result = {}

    def load_params(name):
        if args.weights_dir is None:
            return None
        p = osp.join(args.weights_dir, name)
        if not osp.exists(p):
            return None
        import flax.serialization
        import jax

        with open(p, "rb") as f:
            return flax.serialization.msgpack_restore(f.read())

    def unavailable(metric, need):
        print(f"{metric}: unavailable (missing {need}; pass --weights-dir)")
        result[metric] = None

    task = args.task
    if int(task[0]):
        p = load_params("inception_fid.msgpack")
        if p is None:
            unavailable("FID", "inception_fid.msgpack")
        else:
            import os as _os

            from freefine_tpu.metrics.fid import fid_inception

            assert args.fid_path, "--fid_path required for FID"
            gen_paths = _collect_paths(data, label)
            real_paths = [
                osp.join(args.fid_path, f)
                for f in sorted(os.listdir(args.fid_path))
                if f.lower().endswith((".png", ".jpg", ".jpeg"))
            ]
            result["FID"] = fid_inception(gen_paths, real_paths, p)
    if int(task[1]):
        p = load_params("image_reward.msgpack")
        if p is None:
            unavailable("IRS", "image_reward.msgpack")
        else:
            from freefine_tpu.metrics.scoring import irs, make_irs_scorer

            result["IRS"] = irs(data, label, make_irs_scorer(p))
    if int(task[2]):
        pi = load_params("hps_image.msgpack")
        pt = load_params("hps_text.msgpack")
        if pi is None or pt is None:
            unavailable("HPS", "hps_image.msgpack + hps_text.msgpack")
        else:
            from freefine_tpu.metrics.scoring import hps, make_hps_encoders
            from freefine_tpu.models.tokenizer import load_tokenizer

            tok = load_tokenizer(args.weights_dir)
            enc_i, enc_t = make_hps_encoders(pi, pt, tok)
            result["HPS"] = hps(data, label, enc_i, enc_t)
    if int(task[3]):
        p = load_params("clip_b32.msgpack")
        if p is None:
            unavailable("BGC", "clip_b32.msgpack")
        else:
            from freefine_tpu.metrics.consistency import (
                background_consistency,
                make_clip_encoder,
            )

            result["BGC"] = background_consistency(data, label, make_clip_encoder(p))
    if int(task[4]):
        p = load_params("dino_vitb16.msgpack")
        if p is None:
            unavailable("SUBC", "dino_vitb16.msgpack")
        else:
            from freefine_tpu.metrics.consistency import (
                make_dino_encoder,
                subject_consistency,
            )

            result["SUBC"] = subject_consistency(data, label, make_dino_encoder(p))
    if int(task[5]):
        from freefine_tpu.metrics.wrap_error import wrap_error

        result["WRAP_E"] = wrap_error(data, label)
    if int(task[6]):
        if args.sd_params is None:
            unavailable("MD", "--sd-params (orbax SD checkpoint)")
        else:
            import os.path as _osp

            from freefine_tpu.config import (
                sd15_pipeline_config, sd21_pipeline_config,
                tiny_pipeline_config,
            )
            from freefine_tpu.metrics.md import compute_md, default_corr_path
            from freefine_tpu.ops.dift import make_sd_featurizer
            from freefine_tpu.pipeline import FreeFine, load_pipeline_params

            cfg = {"tiny": tiny_pipeline_config,
                   "sd15": sd15_pipeline_config,
                   "sd21": sd21_pipeline_config}[args.sd_config]()
            pipe = FreeFine(config=cfg, init_random=True,
                            tokenizer_path=args.weights_dir)
            if args.sd_params != "random":
                load_pipeline_params(pipe, args.sd_params)

            if args.md_corr_dir:
                def corr_path_for(gen_path):
                    base = _osp.splitext(_osp.basename(gen_path))[0]
                    return _osp.join(args.md_corr_dir, base + ".npy")
            else:
                corr_path_for = default_corr_path
            result["MD"] = compute_md(
                data, label, make_sd_featurizer(pipe),
                corr_path_for=corr_path_for,
            )
    if int(task[7]) or int(task[8]):
        p = load_params("dinov2_vitb14.msgpack")
        if p is None:
            if int(task[7]):
                unavailable("FID_DINO", "dinov2_vitb14.msgpack")
            if int(task[8]):
                unavailable("FID_KD", "dinov2_vitb14.msgpack")
        else:
            from freefine_tpu.metrics.common import fid_from_features, polynomial_mmd
            from freefine_tpu.metrics.consistency import make_dino_batch_encoder
            from freefine_tpu.metrics.fid import batched_features
            from freefine_tpu.models.dinov2 import dinov2_vitb14

            enc_b, prep = make_dino_batch_encoder(p, dinov2_vitb14())
            gen_paths = _collect_paths(data, label)
            assert args.fid_path, "--fid_path required for the FID family"
            real_paths = [
                osp.join(args.fid_path, f)
                for f in sorted(os.listdir(args.fid_path))
                if f.lower().endswith((".png", ".jpg", ".jpeg"))
            ]
            feats_g = batched_features(gen_paths, enc_b, prep)
            feats_r = batched_features(real_paths, enc_b, prep)
            if int(task[7]):
                result["FID_DINO"] = fid_from_features(feats_g, feats_r)
            if int(task[8]):
                result["FID_KD"] = polynomial_mmd(feats_g, feats_r)

    print("-----Result-----")
    for k, v in result.items():
        print(f"{k}: {v}")
    return result


if __name__ == "__main__":
    main()
