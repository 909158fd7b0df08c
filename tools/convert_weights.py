#!/usr/bin/env python
"""Convert torch checkpoints into framework Orbax checkpoints
(reference analogue: tools/download_imagenet_weights.py +
lib/utils/detectron_weight_helper.py — this environment has no network, so
conversion takes a local .pth/.pt file).

Examples:
    # torchvision ImageNet ResNet-50 backbone init
    python tools/convert_weights.py resnet50.pth --dialect torchvision \
        --out ./pretrained_ckpt

    # Detectron.pytorch full-detector checkpoint
    python tools/convert_weights.py model_final.pth \
        --dialect detectron_pytorch --out ./converted_ckpt
"""

from common import base_parser, load_cfg


def main():
    p = base_parser("Convert torch weights to an Orbax checkpoint")
    p.add_argument("torch_ckpt", help=".pth/.pt/.pkl file")
    p.add_argument("--dialect", default="torchvision",
                   choices=["torchvision", "detectron_pytorch",
                            "detectron_pkl"])
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--report", action="store_true",
                   help="print a key-coverage report: model params the "
                        "import left at init + checkpoint blobs it never "
                        "consumed (dialect-drift diagnosis)")
    args = p.parse_args()
    cfg = load_cfg(args)

    import jax
    import orbax.checkpoint as ocp

    from vosdetectron_tpu.models.generalized_rcnn import (GeneralizedRCNN,
                                                          init_model_params)
    from vosdetectron_tpu.zoo.torch_import import (
        RecordingSource, coverage_report, format_coverage_report,
        import_detectron_pkl, import_detectron_pytorch,
        import_torchvision_resnet, load_detectron_pkl,
        load_torch_checkpoint, merge_params)

    model = GeneralizedRCNN(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0),
                               cfg.test.padded_image_size)
    if args.dialect == "torchvision":
        sd = RecordingSource(load_torch_checkpoint(args.torch_ckpt))
        depth = 101 if "101" in cfg.model.conv_body else 50
        imported = {"body": import_torchvision_resnet(sd, depth)}
        print("NOTE: torchvision ResNets use stride-on-3x3 "
              "(set resnets accordingly / stride_1x1=False)")
    elif args.dialect == "detectron_pkl":
        sd = RecordingSource(load_detectron_pkl(args.torch_ckpt))
        imported = import_detectron_pkl(sd, cfg)
    else:
        sd = RecordingSource(load_torch_checkpoint(args.torch_ckpt))
        imported = import_detectron_pytorch(sd, cfg)
    merged = merge_params(params, imported)
    if args.report:
        print(format_coverage_report(coverage_report(params, imported, sd)))

    ckptr = ocp.StandardCheckpointer()
    import os

    path = os.path.abspath(os.path.join(args.out, "step_00000000"))
    ckptr.save(path, {"step": 0, "params": merged})
    ckptr.wait_until_finished()
    n = sum(1 for _ in jax.tree_util.tree_leaves(imported))
    print(f"converted {n} tensors -> {path}")


if __name__ == "__main__":
    main()
