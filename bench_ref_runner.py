"""Execute the REFERENCE's own filter/colvars code on a bench colvars file.

Launched by bench.py as a subprocess. Arranges sys.path so that
`deep_cartograph` resolves to the UNMODIFIED reference checkout at
/root/reference (not this repo's compat package), stubs the two optional
binary deps its import chain pulls in but never touches on this code path
(Biopython, MDAnalysis — only needed for topology translation, which the
bench colvars don't use), and times:

  1. one full read of the colvars file via the reference's
     plumed.colvars.read_colvars (colvars.py:17-60), and
  2. Filter(...).run() — the reference's per-feature re-read filter loop
     (filter.py:213-256) with entropy+std screens (statistics.py:514-593)
     on a probe-sized file.

Prints ONE JSON line: {"read_s": ..., "filter_s": ..., "n_probe": ...}.

Usage: python bench_ref_runner.py <full_colvars> <probe_colvars> <n_probe>
"""

import json
import sys
import time
import types


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    parent, _, child = name.rpartition(".")
    if parent:
        setattr(sys.modules[parent], child, mod)
    return mod


def main() -> None:
    full_path, probe_path, n_probe = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
    )

    # Reference checkout FIRST; drop this repo so `deep_cartograph` is the
    # reference package, not the compat layer.
    repo_markers = ("/root/repo",)
    sys.path = ["/root/reference"] + [
        p
        for p in sys.path
        if p and not any(p.startswith(m) for m in repo_markers)
    ]
    for key in [k for k in sys.modules if k.startswith("deep_cartograph")]:
        del sys.modules[key]

    # Import stubs for deps absent in this image. The measured path
    # (read_features/read_colvars without topologies + entropy/std stats)
    # never calls into them; they only need to import.
    _stub("Bio")
    _stub("Bio.PDB", PDBParser=object)
    _stub("Bio.Align", PairwiseAligner=object, Alignment=object)
    _stub("Bio.SeqUtils", seq1=lambda s: s)
    _stub("MDAnalysis", Universe=object)
    _stub("MDAnalysis.analysis")
    _stub("MDAnalysis.analysis.rms")
    _stub("MDAnalysis.analysis.align")
    _stub("MDAnalysis.lib")
    _stub("MDAnalysis.lib.distances", calc_bonds=None)
    _stub("MDAnalysis.transformations")

    from deep_cartograph.modules.features.filter import (  # noqa: E501  (reference code)
        Filter,
    )
    from deep_cartograph.modules.plumed.colvars import read_colvars

    assert Filter.__module__.startswith("deep_cartograph"), Filter
    import deep_cartograph as ref_pkg

    assert ref_pkg.__file__.startswith("/root/reference"), ref_pkg.__file__

    t0 = time.time()
    df = read_colvars(full_path)
    read_s = time.time() - t0
    n_rows = len(df)
    del df

    # Reference Filter settings contract (filter.py:92-100): a None
    # significance level disables the dip test; entropy+std screens active.
    settings = {
        "diptest_significance_level": None,
        "entropy_quantile": 0.1,
        "std_quantile": 0.1,
    }
    import os

    out_dir = "/tmp/ref_filter_out"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    filt = Filter(settings, [probe_path], output_dir=out_dir)
    kept = filt.run(csv_summary=False)
    filter_s = time.time() - t0

    print(
        json.dumps(
            {
                "read_s": read_s,
                "n_rows": n_rows,
                "filter_s": filter_s,
                "n_probe": n_probe,
                "n_kept": len(kept),
            }
        )
    )


if __name__ == "__main__":
    main()
