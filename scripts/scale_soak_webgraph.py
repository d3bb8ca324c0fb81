"""Round-4 soak: mirror-host detection and host connected components
at volume, verified against CLOSED-FORM expected outputs.

Mirror plan: ``--docs`` synthetic documents with globally-unique
content keys; every doc lives on host h{doc_id % H}, EVEN docs are
additionally served from m{doc_id % H}. Each host therefore holds
docs/H keys, its mirror holds the even half of exactly those keys, and
cross-host overlap is zero — the TRUE answer is exactly H pairs
(h_k, m_k) with n_inter = evens(k), J = evens(k)/n(k), computable in
closed form per k. The soak asserts the distributed pair set, the
intersection counts and every Jaccard equal the closed form.

Components plan: ``--families`` star graphs of ``--spokes`` spokes
(diameter 2 — min-label converges in ~3 rounds regardless of scale);
centers are named to be each family's lexicographic minimum, so the
TRUE labeling is (member -> center) in closed form.

Usage: python scripts/scale_soak_webgraph.py --docs 1250000 --hosts 5000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_250_000)
    # odd default: with an even H, doc parity correlates with host
    # parity and only half the hosts get mirrors (J=1.0); an odd H
    # gives every host a proper-subset mirror (J around 0.5)
    ap.add_argument("--hosts", type=int, default=4_999)
    ap.add_argument("--families", type=int, default=1_000)
    ap.add_argument("--spokes", type=int, default=100)
    ap.add_argument("--iter-plan", default="auto",
                choices=["auto", "exchange", "broadcast"])
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ocr_model_ray.functions.link_graph import host_components
    from ocr_model_ray.functions.url_ops import host_mirror_pairs

    H = args.hosts
    N = args.docs

    # ---- mirror soak -----------------------------------------------
    def assign(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy().astype(np.int64)
        key = np.char.add("k", ids.astype(str))
        host = np.char.add("h", (ids % H).astype(str))
        even = ids % 2 == 0
        mhost = np.char.add("m", (ids[even] % H).astype(str))
        return pa.table({
            "host": pa.array(np.concatenate([host, mhost])),
            "h": pa.array(np.concatenate([key, key[even]]))})

    ds = rd.range(N).map_batches(assign, batch_format="pyarrow")
    t0 = time.monotonic()
    pairs = host_mirror_pairs(ds, threshold=0.3).to_pandas()
    mirror_s = time.monotonic() - t0

    ids = np.arange(N, dtype=np.int64)
    n_per = np.bincount(ids % H, minlength=H)
    e_per = np.bincount(ids[ids % 2 == 0] % H, minlength=H)
    pairs = pairs.sort_values("host_a").reset_index(drop=True)
    # a pair exists only where the mirror is non-empty and J clears
    # the threshold (an even H makes doc parity correlate with host
    # parity: odd hosts then hold no even docs and have NO mirror)
    jac = np.divide(e_per, n_per, out=np.zeros(H), where=n_per > 0)
    keep = (e_per > 0) & (jac >= 0.3)
    want = pd.DataFrame({
        "host_a": [f"h{k}" for k in range(H) if keep[k]],
        "host_b": [f"m{k}" for k in range(H) if keep[k]],
        "n_inter": e_per[keep].astype("int64"),
        "n_a": n_per[keep].astype("int64"),
        "n_b": e_per[keep].astype("int64"),
        "jaccard": e_per[keep].astype(np.float64)
        / n_per[keep].astype(np.float64),
    }).sort_values("host_a").reset_index(drop=True)
    mirror_ok = (len(pairs) == len(want)
                 and pairs["host_a"].tolist() == want["host_a"].tolist()
                 and pairs["host_b"].tolist() == want["host_b"].tolist()
                 and (pairs["n_inter"].to_numpy()
                      == want["n_inter"].to_numpy()).all()
                 and np.array_equal(
                     pairs["jaccard"].to_numpy().view("int64"),
                     want["jaccard"].to_numpy().view("int64")))

    # ---- components soak -------------------------------------------
    F, S = args.families, args.spokes

    def star(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy().astype(np.int64)
        fam = i // S
        spoke = i % S
        return pa.table({
            "src_host": pa.array([f"a-f{f:05d}" for f in fam.tolist()]),
            "dst_host": pa.array(
                [f"b-f{f:05d}-s{s:03d}" for f, s in
                 zip(fam.tolist(), spoke.tolist())])})

    edges = rd.range(F * S).map_batches(star, batch_format="pyarrow")
    t0 = time.monotonic()
    comp = host_components(edges, mode="distributed",
                           iter_plan=args.iter_plan).to_pandas()
    comp_s = time.monotonic() - t0
    comp_ok = (len(comp) == F * (S + 1)
               and (comp["component"]
                    == comp["host"].str.extract(
                        r"f(\d{5})", expand=False)
                    .map(lambda f: f"a-f{f}")).all())

    result = {
        "docs": N, "hosts": H,
        "mirror_pairs": int(len(pairs)),
        "mirror_sec": round(mirror_s, 1),
        "mirror_closed_form_equal": bool(mirror_ok),
        "families": F, "spokes": S,
        "iter_plan": args.iter_plan,
        "component_rows": int(len(comp)),
        "components_sec": round(comp_s, 1),
        "components_closed_form_equal": bool(comp_ok),
        "pass": bool(mirror_ok and comp_ok),
    }
    print(json.dumps(result))
    ray.shutdown()
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
