"""Stage A: packed-integer felt encodings (base P / base 2^31) for stmt1."""
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
def packed(f,base,nbytes,order,rev):
    l=list(f)
    if rev: l=l[::-1]
    v=((l[3]*base+l[2])*base+l[1])*base+l[0]
    return int(v).to_bytes(nbytes,order)
cands=[]
for base in (P, 1<<31, (1<<31)+1):
    for nbytes in (16, 32):
        for order in ("little","big"):
            for rev in (False,True):
                for group in ("1op","2op"):
                    for cat in ("rf","df"):
                        for pad32 in (False,True):
                            a=packed(s1,base,nbytes,order,rev)
                            b=packed(s2,base,nbytes,order,rev)
                            d=d0
                            if group=="1op":
                                pay=a+b
                                if pad32: pay=pay.ljust(32,b"\0")
                                d=sha(pay+d) if cat=="rf" else sha(d+pay)
                            else:
                                for pay in (a,b):
                                    if pad32: pay=pay.ljust(32,b"\0")
                                    d=sha(pay+d) if cat=="rf" else sha(d+pay)
                            d1=sha(d+roots[2]); rc=draw4(d1)
                            d2=sha(d1+roots[3]); t=draw4(d2)
                            cands.append(((base==P,nbytes,order,rev,group,cat,pad32),rc,t))
B=len(cands); print("candidates:",B)
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
