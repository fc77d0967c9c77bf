"""Method registry — every transfer method addressable by name.

Replaces the reference's importlib string resolution
(reference methods/__init__.py:14-16, config knob ``func_spec`` in
configs/others.yaml:5) with an explicit registry. Classical methods are pure
jittable image->image functions; batched/video evaluation vmaps them
on-device instead of looping through CPU NumPy per item (the reference's
Runner adapter, methods/__init__.py:18-27).

Reference-compatible aliases (the names the reference's demo notebook and
configs use) are registered alongside the short names.
"""

from color_transfer_tpu.methods import linear, iterative

_REGISTRY = {}


def register(name, fn=None):
    """Register a transfer method under ``name`` (usable as decorator)."""
    if fn is None:
        return lambda f: register(name, f)
    if name in _REGISTRY and _REGISTRY[name] is not fn:
        raise ValueError(f"method {name!r} already registered")
    _REGISTRY[name] = fn
    return fn


def get_method(name):
    """Resolve a method by registry name (also accepts the reference's
    dotted func_spec tails like 'methods.linear.color_transfer_between_images')."""
    key = name.rsplit(".", 1)[-1] if name not in _REGISTRY else name
    if key not in _REGISTRY:
        raise KeyError(
            f"unknown method {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[key]


def available_methods():
    return sorted(_REGISTRY)


# --- classical methods + reference-compatible aliases ---
register("reinhard", linear.reinhard)
register("color_transfer_between_images", linear.reinhard)

register("correlated_color_space", linear.correlated_color_space)
register("color_transfer_in_correlated_color_space", linear.correlated_color_space)

register("monge_kantorovitch", linear.monge_kantorovitch)
register("monge_kantorovitch_color_transfer", linear.monge_kantorovitch)

register("idt", iterative.iterative_distribution_transfer)
register("iterative_distribution_transfer", iterative.iterative_distribution_transfer)

register("automated_color_grading", iterative.automated_color_grading)

def color_transfer_between_videos(*args, **kwargs):
    from color_transfer_tpu.methods.video import color_transfer_between_videos as fn

    return fn(*args, **kwargs)


__all__ = [
    "register",
    "get_method",
    "available_methods",
    "color_transfer_between_videos",
    "linear",
    "iterative",
]
