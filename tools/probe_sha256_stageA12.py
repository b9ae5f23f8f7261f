"""Stage A: bitcoin-script minimal number encodings for stmt1 felts,
plus wider limb widths (u64/u128 per limb)."""
import hashlib, os, sys
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

def btc(v):
    if v==0: return b""
    out=bytearray()
    while v: out.append(v&0xFF); v>>=8
    if out[-1]&0x80: out.append(0)
    return bytes(out)

d0=sha(bytes(32)+roots[0])
d0=sha((int(proof.log_size_plonk).to_bytes(4,"little")+bytes(28))+d0)
d0=sha((int(proof.log_size_poseidon).to_bytes(4,"little")+bytes(28))+d0)
d0=sha(d0+roots[1])
h=sha(d0+bytes(4))
z=tuple((int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(4))
alpha=tuple((int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(4,8))
s1=[int(x) for x in proof.plonk_total_sum]
s2=[int(x) for x in proof.poseidon_total_sum]

def draw4(d,n=0,hi=False):
    hh=sha(d+int(n).to_bytes(4,"little"))
    o=4 if hi else 0
    return tuple((int.from_bytes(hh[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(o,o+4))

encs={
 "btc":btc,
 "u64le":lambda v:int(v).to_bytes(8,"little"),
 "u128le":lambda v:int(v).to_bytes(16,"little"),
 "btc_pad4":lambda v:btc(v).ljust(4,b"\0"),
}
arrs={"id":s1+s2,"feltrev":s1[::-1]+s2[::-1],"swap":s2+s1,
      "swaprev":s2[::-1]+s1[::-1],"fullrev":(s1+s2)[::-1]}
splits={"1x8":[8],"2x4":[4,4],"8x1":[1]*8}
cands=[]
for ename,enc in encs.items():
    for aname,limbs in arrs.items():
        for spname,spl in splits.items():
            for cat in ("rf","df"):
                for pad32 in (False,True):
                    d=d0; i=0
                    for cnt in spl:
                        pay=b"".join(enc(x) for x in limbs[i:i+cnt]); i+=cnt
                        if pad32: pay=pay.ljust(32,b"\0")
                        d=sha(pay+d) if cat=="rf" else sha(d+pay)
                    d1=sha(d+roots[2])
                    rc=draw4(d1)
                    d2=sha(d1+roots[3])
                    t=draw4(d2)
                    cands.append(((ename,aname,spname,cat,pad32),rc,t))
B=len(cands)
print("candidates:",B)
samples=np.broadcast_to(samples1[None],(B,)+samples1.shape).copy()
tile=lambda t: QM31(*(np.full(B,v,np.uint32) for v in t))
rcq=QM31(*(np.array([c[1][k] for c in cands],np.uint32) for k in range(4)))
tq=QM31(*(np.array([c[2][k] for c in cands],np.uint32) for k in range(4)))
ok=np.asarray(composition_mod.composition_check(spec,samples,
    tile(tuple(s1)),tile(tuple(s2)),(tile(z),tile(alpha)),rcq,
    points.oods_point_from_t(tq)))
for i in np.nonzero(ok)[0]:
    print("STAGE A PASS:",cands[i][0],flush=True)
print("done",int(ok.sum()),"/",B)
