"""Pytree helpers: dotted-path flattening for nested param dicts."""


def flatten(tree, prefix=""):
    """Nested dict -> {dotted_path: leaf}."""
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, path))
        else:
            out[path] = v
    return out


def unflatten(flat):
    """{dotted_path: leaf} -> nested dict."""
    tree = {}
    for path, v in flat.items():
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def tree_size(tree):
    import numpy as np
    return sum(int(np.prod(v.shape)) for v in flatten(tree).values())
