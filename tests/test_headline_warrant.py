"""Guard: bench.py's DEFAULT profile must carry committed fidelity evidence.

The headline number (BENCH_r*.json) is produced by ``python bench.py`` with
its default arguments.  The claim that the default serving profile is
fidelity-equivalent to exact reference semantics (paired dPSNR within
0.1 dB) rests on a committed parity artifact measured at the production
256^2 shape (PARITY_r07_256.json, PERF.md round-10).  This test re-derives
which profile bench.py's DEFAULTS select and asserts the committed artifact
contains a ``within_0p1db: true`` block — with a 95% CI upper bound below
0.1 dB — for THAT exact profile.  Flipping bench.py's default to a profile
without fresh fidelity evidence fails this test instead of silently
shipping an unwarranted headline (VERDICT round-3 weak #6 / next #7).
"""
import ast
import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_defaults() -> dict:
    """Extract bench.py's argparse defaults without executing it."""
    tree = ast.parse(open(os.path.join(REPO, "bench.py")).read())
    defaults = {}
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "add_argument"
            and node.args
            and isinstance(node.args[0], ast.Constant)
        ):
            name = node.args[0].value.lstrip("-").replace("-", "_")
            for kw in node.keywords:
                if kw.arg == "default" and isinstance(kw.value, ast.Constant):
                    defaults[name] = kw.value.value
    return defaults


def _profile_key(fast: int, min_tokens: int) -> str | None:
    """bench profile args -> parity-artifact profile key.

    At the production 256^2 shape the UNet has CA sites with 4096 and 16384
    tokens; min_tokens=4096 pools BOTH sites (the ``kv_pool_N`` parity leg)
    while min_tokens=8192 pools only the 16384-token site (``selective_N``).
    """
    if fast <= 1:
        return None  # exact semantics need no approximation warrant
    if min_tokens <= 4096:
        return f"kv_pool_{fast}"
    if min_tokens <= 16384:
        return f"selective_{fast}"
    return f"UNPOOLED_min_tokens_{min_tokens}"  # pools nothing at 256^2


def test_default_profile_has_fidelity_warrant():
    defaults = _bench_defaults()
    assert "fast" in defaults and "fast_min_tokens" in defaults, (
        "bench.py no longer exposes --fast/--fast-min-tokens; update this "
        "guard to derive the default profile from the new interface"
    )
    profile = _profile_key(defaults["fast"], defaults["fast_min_tokens"])
    if profile is None:
        return  # exact default: nothing to warrant

    # The warrant must come from a parity artifact at the PRODUCTION shape
    # (res=256) on a trained checkpoint.
    candidates = sorted(glob.glob(os.path.join(REPO, "PARITY_*256*.json")))
    assert candidates, (
        f"bench.py defaults select profile '{profile}' but no 256^2 parity "
        "artifact (PARITY_*256*.json) is committed"
    )
    warranted = []
    for path in candidates:
        d = json.load(open(path))
        cfg = d.get("config", {})
        if cfg.get("res") != 256:
            continue
        block = (
            d.get("phantom_resdiff", {})
            .get("profiles_50step", {})
            .get(profile)
        )
        if not block:
            continue
        delta = block.get("delta_vs_exact", {}).get("psnr", {})
        # The decision interval is the CONSERVATIVE one: image-clustered
        # (seed replicates averaged per image first — VERDICT round-4
        # weak #2) when present, flat otherwise.  At least one committed
        # artifact must carry the clustered block (tools/recluster_stats.py
        # re-emits legacy artifacts with it).
        gate = delta.get("clustered_by_image", delta)
        if (
            block.get("within_0p1db") is True
            and gate.get("ci95")
            and abs(gate["ci95"][1]) < 0.1
            and abs(gate.get("mean", 1.0)) < 0.1
            and delta.get("n", 0) >= 64
        ):
            warranted.append((path, "clustered_by_image" in delta))
    assert warranted, (
        f"bench.py's default profile '{profile}' (fast={defaults['fast']}, "
        f"min_tokens={defaults['fast_min_tokens']}) has NO committed 256^2 "
        "fidelity warrant: no PARITY_*256*.json contains profiles_50step."
        f"{profile} with within_0p1db=true, |dPSNR mean| and CI95 upper "
        "< 0.1 dB, n>=64.  Run the parity harness for this profile before "
        "making it the bench default."
    )
    assert any(clustered for _, clustered in warranted), (
        "every warranting artifact uses only the flat (anti-conservative) "
        "CI; at least one must carry the image-clustered interval "
        "(tools/recluster_stats.py re-emits legacy artifacts with it)"
    )
