"""Convert the published GMFlow torch checkpoint to this framework's params.

The reference downloads ``gmflow-scale2-regrefine6-mixdata`` from S3 and
loads it with strict=False (reference unimatch/__init__.py:10-13,:55-57);
DMSCT freezes those weights (reference methods/dmsct.py:31-32), so eval
parity of the deep path requires this port. Usage (offline, with the .pth
downloaded on a machine with network access):

    python -m color_transfer_tpu.tools.convert_gmflow \
        --torch_ckpt gmflow-scale2-regrefine6-mixdata-*.pth \
        --out gmflow_mixdata_flax

Layout transforms: torch conv (O, I, kh, kw) -> flax (kh, kw, I, O); torch
linear (O, I) -> flax (I, O); LayerNorm weight -> scale. InstanceNorm carries
no parameters (affine=False).
"""

import argparse
import pickle
from pathlib import Path

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w):
    return np.transpose(w, (1, 0))


def _residual_block(sd, prefix):
    out = {
        "conv1": {"kernel": _conv(sd[f"{prefix}.conv1.weight"])},
        "conv2": {"kernel": _conv(sd[f"{prefix}.conv2.weight"])},
    }
    if f"{prefix}.downsample.0.weight" in sd:
        out["downsample_conv"] = {
            "kernel": _conv(sd[f"{prefix}.downsample.0.weight"]),
            "bias": sd[f"{prefix}.downsample.0.bias"],
        }
    return out


def _conv_mod(sd, prefix, bias=True):
    out = {"kernel": _conv(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _dense_mod(sd, prefix, bias=True):
    out = {"kernel": _dense(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _transformer_layer(sd, prefix, with_ffn):
    out = {
        "q_proj": _dense_mod(sd, f"{prefix}.q_proj"),
        "k_proj": _dense_mod(sd, f"{prefix}.k_proj"),
        "v_proj": _dense_mod(sd, f"{prefix}.v_proj"),
        "merge": _dense_mod(sd, f"{prefix}.merge"),
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
    }
    if with_ffn:
        out["mlp_0"] = _dense_mod(sd, f"{prefix}.mlp.0")
        out["mlp_2"] = _dense_mod(sd, f"{prefix}.mlp.2")
        out["norm2"] = _layernorm(sd, f"{prefix}.norm2")
    return out


def convert_state_dict(sd, num_layers=None):
    """torch GMFlow state_dict (numpy values) -> flax params for
    models.gmflow.GMFlow ({'core': {...}}). num_layers is inferred from the
    ``transformer.layers.N`` keys when not given."""
    if num_layers is None:
        num_layers = 1 + max(
            int(k.split(".")[2])
            for k in sd
            if k.startswith("transformer.layers.")
        )
    backbone = {
        "conv1": {"kernel": _conv(sd["backbone.conv1.weight"])},
        "conv2": _conv_mod(sd, "backbone.conv2"),
        "trident_kernel": _conv(sd["backbone.trident_conv.weight"]),
    }
    for layer, name in [(1, "layer1"), (2, "layer2"), (3, "layer3")]:
        for i in range(2):
            backbone[f"{name}_{i}"] = _residual_block(sd, f"backbone.{name}.{i}")

    transformer = {}
    for i in range(num_layers):
        transformer[f"layer_{i}"] = {
            "self_attn": _transformer_layer(
                sd, f"transformer.layers.{i}.self_attn", with_ffn=False
            ),
            "cross_attn_ffn": _transformer_layer(
                sd, f"transformer.layers.{i}.cross_attn_ffn", with_ffn=True
            ),
        }

    core = {
        "backbone": backbone,
        "transformer": transformer,
        "feature_flow_attn": {
            "q_proj": _dense_mod(sd, "feature_flow_attn.q_proj"),
            "k_proj": _dense_mod(sd, "feature_flow_attn.k_proj"),
        },
        "refine_proj": _conv_mod(sd, "refine_proj"),
        "refine": {
            "encoder": {
                name: _conv_mod(sd, f"refine.encoder.{name}")
                for name in ["convc1", "convc2", "convf1", "convf2", "conv"]
            },
            "gru": {
                name: _conv_mod(sd, f"refine.gru.{name}")
                for name in ["convz1", "convr1", "convq1", "convz2", "convr2", "convq2"]
            },
            "flow_head": {
                "conv1": _conv_mod(sd, "refine.flow_head.conv1"),
                "conv2": _conv_mod(sd, "refine.flow_head.conv2"),
            },
            "mask_0": _conv_mod(sd, "refine.mask.0"),
            "mask_2": _conv_mod(sd, "refine.mask.2"),
        },
    }
    return {"core": core}


def invert_to_state_dict(params):
    """Inverse mapping (flax -> torch-layout dict). Used by the round-trip
    tests and to fabricate reference-layout checkpoints."""
    core = params["core"]
    sd = {}

    def put_conv(key, mod):
        sd[f"{key}.weight"] = np.transpose(np.asarray(mod["kernel"]), (3, 2, 0, 1))
        if "bias" in mod:
            sd[f"{key}.bias"] = np.asarray(mod["bias"])

    def put_dense(key, mod):
        sd[f"{key}.weight"] = np.transpose(np.asarray(mod["kernel"]))
        if "bias" in mod:
            sd[f"{key}.bias"] = np.asarray(mod["bias"])

    def put_ln(key, mod):
        sd[f"{key}.weight"] = np.asarray(mod["scale"])
        sd[f"{key}.bias"] = np.asarray(mod["bias"])

    bb = core["backbone"]
    put_conv("backbone.conv1", bb["conv1"])
    put_conv("backbone.conv2", bb["conv2"])
    sd["backbone.trident_conv.weight"] = np.transpose(
        np.asarray(bb["trident_kernel"]), (3, 2, 0, 1)
    )
    for name in ["layer1", "layer2", "layer3"]:
        for i in range(2):
            blk = bb[f"{name}_{i}"]
            put_conv(f"backbone.{name}.{i}.conv1", blk["conv1"])
            put_conv(f"backbone.{name}.{i}.conv2", blk["conv2"])
            if "downsample_conv" in blk:
                put_conv(f"backbone.{name}.{i}.downsample.0", blk["downsample_conv"])

    for lname, layer in core["transformer"].items():
        i = lname.split("_")[1]
        for sub, with_ffn in [("self_attn", False), ("cross_attn_ffn", True)]:
            mod = layer[sub]
            base = f"transformer.layers.{i}.{sub}"
            for proj in ["q_proj", "k_proj", "v_proj", "merge"]:
                put_dense(f"{base}.{proj}", mod[proj])
            put_ln(f"{base}.norm1", mod["norm1"])
            if with_ffn:
                put_dense(f"{base}.mlp.0", mod["mlp_0"])
                put_dense(f"{base}.mlp.2", mod["mlp_2"])
                put_ln(f"{base}.norm2", mod["norm2"])

    put_dense("feature_flow_attn.q_proj", core["feature_flow_attn"]["q_proj"])
    put_dense("feature_flow_attn.k_proj", core["feature_flow_attn"]["k_proj"])
    put_conv("refine_proj", core["refine_proj"])
    for name in ["convc1", "convc2", "convf1", "convf2", "conv"]:
        put_conv(f"refine.encoder.{name}", core["refine"]["encoder"][name])
    for name in ["convz1", "convr1", "convq1", "convz2", "convr2", "convq2"]:
        put_conv(f"refine.gru.{name}", core["refine"]["gru"][name])
    put_conv("refine.flow_head.conv1", core["refine"]["flow_head"]["conv1"])
    put_conv("refine.flow_head.conv2", core["refine"]["flow_head"]["conv2"])
    put_conv("refine.mask.0", core["refine"]["mask_0"])
    put_conv("refine.mask.2", core["refine"]["mask_2"])
    return sd


def load_matcher_params(path, template):
    """Load converted matcher params (pickle of the flax tree) and validate
    shapes against ``template`` (the randomly-initialized tree)."""
    import jax

    with open(path, "rb") as f:
        loaded = pickle.load(f)

    def check(path_, a, b):
        assert np.shape(a) == np.shape(b), f"shape mismatch at {path_}"
        return np.asarray(a, dtype=np.float32)

    flat_l = jax.tree_util.tree_flatten_with_path(loaded)[0]
    flat_t = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(template)[0]}
    out = {}
    for k, v in flat_l:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_t, f"unexpected param {ks}"
        check(ks, v, flat_t[ks])
    return jax.tree_util.tree_map(
        lambda t, l: np.asarray(l, dtype=np.float32), template, loaded
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_ckpt", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import torch

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in ckpt.get("model", ckpt).items()}
    params = convert_state_dict(sd)
    with open(args.out, "wb") as f:
        pickle.dump(params, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
