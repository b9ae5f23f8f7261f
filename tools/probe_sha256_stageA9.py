"""Stage A carpet-bomb: vectorized composition oracle over candidate lanes.
stmt1 = chunked per-k-limb ops x pads x orders x cat; draws x ctr rules."""
import hashlib, itertools, os, sys
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.verifier import composition as composition_mod, points
from recursive_stwo_tpu.verifier.arrays import flatten_samples
from recursive_stwo_tpu.verifier.spec import VerifierSpec
from recursive_stwo_tpu.core.qm31 import QM31

HERE=os.path.dirname(__file__)
FIXTURE=os.path.join(HERE,"..","recursive_stwo_tpu","testdata","hybrid_hash.bin")
P=2147483647
sha=lambda b: hashlib.sha256(b).digest()
data=open(FIXTURE,"rb").read()
proof=parse_plonk_with_poseidon_proof(data,hash_mode="bytes32")
spec=VerifierSpec.from_proof(proof)
sp=proof.stark_proof
roots=[bytes(np.asarray(h,np.uint8)) for h in sp.commitments]
samples1=flatten_samples(spec,proof)

d0=sha(bytes(32)+roots[0])
d0=sha((int(proof.log_size_plonk).to_bytes(4,"little")+bytes(28))+d0)
d0=sha((int(proof.log_size_poseidon).to_bytes(4,"little")+bytes(28))+d0)
d0=sha(d0+roots[1])
h=sha(d0+bytes(4))
z=tuple((int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(4))
alpha=tuple((int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(4,8))

s1=[int(x) for x in proof.plonk_total_sum]
s2=[int(x) for x in proof.poseidon_total_sum]

def draw4(d,n,hi=False,rev=False):
    hh=sha(d+int(n).to_bytes(4,"little"))
    o=4 if hi else 0
    l=[(int.from_bytes(hh[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(o,o+4)]
    return tuple(l[::-1] if rev else l)

# --- stmt1 candidates: digest d0 -> d1' (before root2 mix) ---
stmt1={}
for chunk in (1,2,4,8):
    for pad32 in (False,True):
        for lorder in ("abcd","dcba"):
            for forder in ("12","21"):
                for cat in ("rf","df"):
                    limbs=(s1+s2) if forder=="12" else (s2+s1)
                    if lorder=="dcba":
                        limbs=(limbs[3::-1]+limbs[7:3:-1])
                    d=d0
                    for i in range(0,8,chunk):
                        pay=b"".join(int(x).to_bytes(4,"little") for x in limbs[i:i+chunk])
                        if pad32: pay=pay.ljust(32,b"\0")
                        d=sha(pay+d) if cat=="rf" else sha(d+pay)
                    stmt1[(chunk,pad32,lorder,forder,cat)]=d
# plus: one op with felts swapped halves interleaved etc. keep as is.

draw_variants=[]
for ctr_mode in ("reset","global"):
    for hi in (False,True):
        for rev in (False,True):
            draw_variants.append((ctr_mode,hi,rev))

cands=[]
for skey,d1p in stmt1.items():
    d1=sha(d1p+roots[2])
    d2=sha(d1+roots[3])
    for (cm,hi,rev) in draw_variants:
        rcn,on=(0,0) if cm=="reset" else (1,2)
        rc=draw4(d1,rcn,hi,rev)
        t=draw4(d2,on,hi,rev)
        cands.append((skey,(cm,hi,rev),rc,t))
print("candidates:",len(cands))

B=len(cands)
samples=np.broadcast_to(samples1[None],(B,)+samples1.shape).copy()
qarr=lambda col: QM31(*(np.array([c[col][k] for c in cands],np.uint32) for k in range(4)))
rcq=QM31(*(np.array([c[2][k] for c in cands],np.uint32) for k in range(4)))
tq=QM31(*(np.array([c[3][k] for c in cands],np.uint32) for k in range(4)))
tile=lambda t: QM31(*(np.full(B,v,np.uint32) for v in t))
ok=composition_mod.composition_check(spec,samples,
    tile(tuple(s1)),tile(tuple(s2)),(tile(z),tile(alpha)),rcq,
    points.oods_point_from_t(tq))
ok=np.asarray(ok)
idx=np.nonzero(ok)[0]
for i in idx:
    print("STAGE A PASS:",cands[i][0],cands[i][1],flush=True)
print("done",len(idx),"/",B)
