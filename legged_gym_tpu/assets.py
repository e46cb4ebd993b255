"""Asset (URDF / actuator-net) path resolution.

The framework ships its own ``resources/`` tree at the repo root (URDF
robot descriptions + actuator-net weights) and is self-contained; the
layout is the standard legged_gym resource tree (``resources/robots/<name>/urdf/*.urdf``,
``resources/actuator_nets/*.pt``). Point ``LEGGED_GYM_TPU_ASSETS`` at a
checkout's ``resources`` directory; config paths use the
``{ASSETS}`` placeholder (the analog of the reference's
``{LEGGED_GYM_ROOT_DIR}`` templating, go1_config.py:76).
"""
import os

_DEFAULT_CANDIDATES = (
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "resources"),
    "/root/reference/resources",
)


def assets_root():
    root = os.environ.get("LEGGED_GYM_TPU_ASSETS")
    if root:
        return root
    for cand in _DEFAULT_CANDIDATES:
        if os.path.isdir(cand):
            return cand
    raise FileNotFoundError(
        "No asset root found: set LEGGED_GYM_TPU_ASSETS to a legged_gym "
        "'resources' directory (robots/<name>/urdf/*.urdf)")


def resolve(path):
    """Expand the {ASSETS} placeholder in a config asset path."""
    if "{ASSETS}" in path:
        path = path.replace("{ASSETS}", assets_root())
    return path
