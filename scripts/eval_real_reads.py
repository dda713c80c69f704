import sys, glob, os, numpy as np, Levenshtein
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
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
    import h5py

    from scrappie_tpu.api import basecall_events

    seqs = []
    for f5 in f5s:
        with h5py.File(f5) as h:
            r = list(h["Raw/Reads"])[0]
            sig = h[f"Raw/Reads/{r}/Signal"][()].astype(np.float32)
            m = h["/UniqueGlobalKey/channel_id"].attrs
            sig = (sig + m["offset"]) * (m["range"] / m["digitisation"])
        seqs.append(basecall_events(sig)[0] or "")
else:
    eng = BasecallEngine(model, batch_size=16)
    seqs = [res.sequence or "" for _, res in eng.basecall_files(f5s)]
for seq, name, truth in zip(seqs, names, truths):
    fwd, rev = identity(seq, truth), identity(seq, revcomp(truth))
    print(f"{model:12s} {name:14s} called {len(seq):6d} truth {len(truth):6d} id_fwd {fwd:.3f} id_rc {rev:.3f}", flush=True)
