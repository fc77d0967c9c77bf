"""Convert the reference's published Lightning checkpoints to flax params.

The reference ships trained checkpoints as W&B artifacts
(reference demo.ipynb cells 24/26: DCMCS3DI epoch=96-step=10185, DMSCT
epoch=72-step=7665, saved by ModelCheckpoint per configs/*.yaml:23-27).
Evaluation parity of the deep methods requires porting them
(SURVEY.md §7 hard part #1). Usage offline:

    python -m color_transfer_tpu.tools.convert_checkpoints \
        --kind dcmcs3di --torch_ckpt epoch=96-step=10185.ckpt --out dcmcs3di_flax
    python -m color_transfer_tpu.tools.convert_checkpoints \
        --kind dmsct --torch_ckpt epoch=72-step=7665.ckpt --out dmsct_flax

Key layout maps (torch module tree -> this framework's flax tree):
  DCMCS3DI (reference methods/dcmcs3di.py:41-51, pasmnet/*):
    extraction.0            -> extraction/Conv_0
    extraction.i (ResB)     -> extraction/ResB_{i-1}
    matcher.{head,query,key,value} -> matcher/...
    transfer.0 / ResBs / last two convs -> transfer/...
  DMSCT (reference methods/dmsct.py:30-56):
    matcher.*               -> matcher/ (convert_gmflow mapping)
    encoder._conv_stem etc. -> encoder/stem_conv, stage{s}_block{r}/...
    decoder.blocks.i.conv{1,2}.0 -> decoder/block{i}/conv{1,2}
    head.0                  -> head/conv
  BatchNorm running stats land in the batch_stats collection.
"""

import argparse
import pickle

import numpy as np

from color_transfer_tpu.models.efficientnet import _B0_STAGES, _COEFFS, round_repeats
from color_transfer_tpu.tools import convert_gmflow


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _depthwise(w):
    # torch depthwise: (C, 1, kh, kw) -> flax grouped conv: (kh, kw, 1, C)
    return np.transpose(w, (2, 3, 1, 0))


def _conv_mod(sd, prefix):
    out = {"kernel": _conv(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _my_conv(sd, prefix):
    """My layers.Conv wraps nn.Conv as its first submodule."""
    return {"Conv_0": _conv_mod(sd, prefix)}


def _resb(sd, prefix):
    """ResB: body.0 conv -> Conv_0, body.2 conv -> Conv_1
    (reference pasmnet/backbone.py:8-12)."""
    return {
        "Conv_0": _my_conv(sd, f"{prefix}.body.0"),
        "Conv_1": _my_conv(sd, f"{prefix}.body.2"),
    }


def convert_dcmcs3di(sd, extraction_layers=18, transfer_layers=6):
    """Lightning state_dict (numpy values) -> flax params for DCMCS3DI."""
    extraction = {"Conv_0": _my_conv(sd, "extraction.0")}
    for i in range(extraction_layers):
        extraction[f"ResB_{i}"] = _resb(sd, f"extraction.{i + 1}")

    matcher = {
        "head": _resb(sd, "matcher.head"),
        "query": _my_conv(sd, "matcher.query"),
        "key": _my_conv(sd, "matcher.key"),
        "value": _my_conv(sd, "matcher.value"),
    }

    transfer = {"Conv_0": _my_conv(sd, "transfer.0")}
    for i in range(transfer_layers):
        transfer[f"ResB_{i}"] = _resb(sd, f"transfer.{i + 1}")
    transfer["Conv_1"] = _my_conv(sd, f"transfer.{transfer_layers + 1}")
    transfer["Conv_2"] = _my_conv(sd, f"transfer.{transfer_layers + 2}")

    return {"extraction": extraction, "matcher": matcher, "transfer": transfer}


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return {"BatchNorm_0": params}, {"BatchNorm_0": stats}


def convert_efficientnet(sd, prefix="encoder", name_variant="efficientnet-b2",
                         depth=4):
    """smp/efficientnet-pytorch keys -> (params, batch_stats) for
    models.efficientnet.EfficientNetEncoder."""
    width, depth_c = _COEFFS[name_variant]
    params, stats = {}, {}

    params["stem_conv"] = {"kernel": _conv(sd[f"{prefix}._conv_stem.weight"])}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, f"{prefix}._bn0")

    flat = 0
    # Features produced so far: input + the stem tap (smp's reduction-2
    # feature is the stem output — see models/efficientnet.py).
    produced = 2
    taps = {1: 2, 2: 3, 4: 4, 6: 5}
    if produced == depth + 1:
        return params, stats
    for stage_idx, (k, s, e, base_out, base_r) in enumerate(_B0_STAGES):
        repeats = round_repeats(base_r, depth_c)
        for r in range(repeats):
            bprefix = f"{prefix}._blocks.{flat}"
            name = f"stage{stage_idx}_block{r}"
            p, st = {}, {}
            if e != 1:
                p["expand_conv"] = {
                    "kernel": _conv(sd[f"{bprefix}._expand_conv.weight"])
                }
                p["bn0"], st["bn0"] = _bn(sd, f"{bprefix}._bn0")
            p["depthwise_conv"] = {
                "kernel": _depthwise(sd[f"{bprefix}._depthwise_conv.weight"])
            }
            p["bn1"], st["bn1"] = _bn(sd, f"{bprefix}._bn1")
            p["se_reduce"] = _conv_mod(sd, f"{bprefix}._se_reduce")
            p["se_expand"] = _conv_mod(sd, f"{bprefix}._se_expand")
            p["project_conv"] = {
                "kernel": _conv(sd[f"{bprefix}._project_conv.weight"])
            }
            p["bn2"], st["bn2"] = _bn(sd, f"{bprefix}._bn2")
            params[name] = p
            stats[name] = st
            flat += 1
        if stage_idx in taps and taps[stage_idx] <= depth:
            produced += 1
        if produced == depth + 1:
            break
    return params, stats


def convert_dmsct(sd, decoder_channels=(256, 128, 64, 32)):
    """Lightning state_dict -> (params, batch_stats) for models.dmsct.DMSCT."""
    matcher_sd = {
        k[len("matcher.") :]: v for k, v in sd.items() if k.startswith("matcher.")
    }
    matcher = convert_gmflow.convert_state_dict(matcher_sd)

    enc_params, enc_stats = convert_efficientnet(sd)

    decoder = {}
    for i in range(len(decoder_channels)):
        decoder[f"block{i}"] = {
            "conv1": _conv_mod(sd, f"decoder.blocks.{i}.conv1.0"),
            "conv2": _conv_mod(sd, f"decoder.blocks.{i}.conv2.0"),
        }

    params = {
        "matcher": matcher,
        "encoder": enc_params,
        "decoder": decoder,
        "head": {"conv": _conv_mod(sd, "head.0")},
    }
    batch_stats = {"encoder": enc_stats}
    return params, batch_stats


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", choices=["dcmcs3di", "dmsct"], required=True)
    parser.add_argument("--torch_ckpt", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import torch

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}

    if args.kind == "dcmcs3di":
        hp = ckpt.get("hyper_parameters", {})
        tree = {
            "params": convert_dcmcs3di(
                sd,
                extraction_layers=hp.get("extraction_layers", 18),
                transfer_layers=hp.get("transfer_layers", 6),
            )
        }
    else:
        params, batch_stats = convert_dmsct(sd)
        tree = {"params": params, "batch_stats": batch_stats}

    with open(args.out, "wb") as f:
        pickle.dump(tree, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
