import sys, glob, os, numpy as np, Levenshtein
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()

from scrappie_tpu.parallel.runner import BasecallEngine

def identity(a, b):
    return 1.0 - Levenshtein.distance(a, b) / max(len(a), len(b), 1)

def revcomp(s):
    return s.translate(str.maketrans("ACGT","TGCA"))[::-1]

names = ["ch174_read172", "ch271_read66"]
f5s, truths = [], []
for name in names:
    f5s.append(glob.glob(f"/root/reference/reads/*{name}_strand.fast5")[0])
    fat = glob.glob(f"/root/reference/reads/*{name}_strand.fa")[0]
    truths.append("".join(l.strip() for l in open(fat) if not l.startswith(">")))

model = sys.argv[1]
if model == "nanonet_events":
    from scrappie_tpu.api import basecall_events
    from scrappie_tpu.io.fast5 import read_raw

    seqs = [basecall_events(read_raw(f5, scale_to_pA=True).raw)[0] or ""
            for f5 in f5s]
else:
    eng = BasecallEngine(model, batch_size=16)
    seqs = [res.sequence or "" for _, res in eng.basecall_files(f5s)]
for seq, name, truth in zip(seqs, names, truths):
    fwd, rev = identity(seq, truth), identity(seq, revcomp(truth))
    print(f"{model:12s} {name:14s} called {len(seq):6d} truth {len(truth):6d} id_fwd {fwd:.3f} id_rc {rev:.3f}", flush=True)
