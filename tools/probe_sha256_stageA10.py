"""Stage A: mix_felts = sha-absorb of a POSEIDON hash of the felts."""
import hashlib, os, sys
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof
from recursive_stwo_tpu.verifier import composition as composition_mod, points
from recursive_stwo_tpu.verifier.arrays import flatten_samples
from recursive_stwo_tpu.verifier.spec import VerifierSpec
from recursive_stwo_tpu.verifier.hints import hash_column_capacity, hash_node, _permute16
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
limbs8=np.array(s1+s2,np.uint32)

def m31s_to_bytes(a,order="little"):
    return b"".join(int(x).to_bytes(4,order) for x in a)

inners={}
inners["capacity"]=hash_column_capacity(limbs8)                  # absorb chunk
inners["leaf"]=hash_node(None,limbs8)                            # leaf hash
inners["rate_lo"]=_permute16(np.concatenate([limbs8,np.zeros(8,np.uint32)]))[:8]
inners["rate_hi"]=_permute16(np.concatenate([limbs8,np.zeros(8,np.uint32)]))[8:]
inners["rate_lo_rev"]=_permute16(np.concatenate([np.zeros(8,np.uint32),limbs8]))[:8]
inners["rate_hi_rev"]=_permute16(np.concatenate([np.zeros(8,np.uint32),limbs8]))[8:]
# feed-forward variants (add input back)
pf=_permute16(np.concatenate([limbs8,np.zeros(8,np.uint32)]))
inners["rate_lo_ff"]=(pf[:8].astype(np.uint64)+limbs8)%P
cands=[]
for iname,ih in inners.items():
    for order in ("little","big"):
        pay=m31s_to_bytes(ih,order)
        for cat in ("rf","df"):
            d1=sha(pay+d0) if cat=="rf" else sha(d0+pay)
            d1=sha(d1+roots[2])
            hh=sha(d1+bytes(4))
            rc=tuple((int.from_bytes(hh[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(4))
            d2=sha(d1+roots[3])
            hh2=sha(d2+bytes(4))
            t=tuple((int.from_bytes(hh2[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(4))
            cands.append(((iname,order,cat),rc,t))
B=len(cands)
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
