"""Guard the committed dryrun compile cache (VERDICT-r2 #4).

The driver's dryrun only fits its time budget because `.xla_cache/` ships
warmed entries for the exact programs it compiles; a commit that drifts the
HLO silently invalidates them (the b7145d8 near-miss). The fast test checks
the committed fingerprint artifact is present and well-formed; the
slow-marked test re-lowers the dryrun programs in the canonical env and
fails loudly on drift — run it (or `python tools/hlo_fingerprint.py`)
before round end whenever ops/model code changed.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FP_PATH = os.path.join(REPO, ".xla_cache", "HLO_FINGERPRINT.json")


def test_fingerprint_artifact_present_and_wellformed():
    assert os.path.exists(FP_PATH), (
        "no committed HLO fingerprint — run tools/hlo_fingerprint.py "
        "--update after warming .xla_cache/")
    with open(FP_PATH) as f:
        fp = json.load(f)
    for key in ("train_step", "spatial_fwd"):
        assert key in fp, f"fingerprint missing {key!r}"
        assert isinstance(fp[key], str) and len(fp[key]) == 64, (
            f"{key!r} is not a sha256 hex digest: {fp[key]!r}")
    import jax
    assert fp.get("jax") == jax.__version__, (
        f"fingerprint was computed under jax {fp.get('jax')}, running "
        f"{jax.__version__} — re-verify the cache against this version")


def test_source_stamp_matches_committed():
    """FAST drift check (VERDICT-r3 Weak #1b): the real HLO comparison is
    slow-marked, so the default suite used to stay green while the
    committed .xla_cache/ was stale. This recomputes the cheap source
    stamp over every HLO-shaping directory; any edit there fails the
    default suite until tools/hlo_fingerprint.py has been re-run."""
    sys.path.insert(0, REPO)
    from tools.hlo_fingerprint import source_stamp
    with open(FP_PATH) as f:
        fp = json.load(f)
    assert fp.get("source") == source_stamp(), (
        "HLO-shaping sources changed since the fingerprint was stamped — "
        "run `python tools/hlo_fingerprint.py` (and re-warm .xla_cache/ + "
        "`--update` if it reports drift) BEFORE round end")


def test_every_hlo_shaping_env_knob_is_stripped():
    """ADVICE-r4 medium: the old deny-list covered only the bench-mode
    knobs; any OTHER FDN_* var read by traced code could leak from the
    caller's shell into the dryrun/fingerprint (the
    JAX_DEFAULT_MATMUL_PRECISION incident, generalized). This greps every
    HLO-shaping tree for FDN_* env reads and asserts strip_hlo_env()
    removes each one — so adding a new knob anywhere in those trees fails
    the suite until it is consciously classified (stripped by default;
    allowlisted only with a no-HLO justification in __graft_entry__)."""
    import re
    sys.path.insert(0, REPO)
    import __graft_entry__ as g
    import bench

    pat = re.compile(r"FDN_[A-Z0-9_]+")
    found = set()
    for d in ("ops", "nn", "models", "kernels", "train", "parallel"):
        root = os.path.join(REPO, "fdn_tip2025_tpu", d)
        for dirpath, _, names in os.walk(root):
            for n in names:
                if not n.endswith(".py"):
                    continue
                with open(os.path.join(dirpath, n)) as f:
                    for line in f:
                        if "environ" in line:
                            found |= set(pat.findall(line))
    # bench-mode knobs are read at trace time too (bench.py docstring)
    found |= {k for env in bench._MODE_ENV.values() for k in env}
    assert len(found) >= 20, f"grep looks broken, found only {sorted(found)}"

    env = {k: "1" for k in found}
    env["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
    g.strip_hlo_env(env)
    leaked = (set(env) & found) - g._HLO_ENV_ALLOW
    assert not leaked, (
        f"HLO-shaping env knobs survive strip_hlo_env(): {sorted(leaked)} "
        "— they must be stripped (or allowlisted in "
        "__graft_entry__._HLO_ENV_ALLOW with a no-HLO justification)")
    assert "JAX_DEFAULT_MATMUL_PRECISION" not in env
    # knobs that ARE read by traced code must never sit in the allowlist
    # (FDN_NATIVE_LOADER's claim is exactly that no traced tree reads it,
    # so it failing here would mean the allowlist justification is stale)
    traced_allowlisted = found & g._HLO_ENV_ALLOW
    assert not traced_allowlisted, (
        f"allowlisted env vars are read by HLO-shaping code: "
        f"{sorted(traced_allowlisted)} — remove them from _HLO_ENV_ALLOW")


@pytest.mark.slow
def test_fingerprint_matches_current_programs():
    """Re-lower the dryrun train step + spatial forward and compare
    against the committed hashes (the exact check the tool does)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "hlo_fingerprint.py")],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, (
        "dryrun HLO drifted out of the committed .xla_cache/:\n"
        + proc.stdout + proc.stderr)
