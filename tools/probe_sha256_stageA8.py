"""Stage A: broad stmt1 space x draw-counter rules."""
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
samples=flatten_samples(spec,proof)[None]
qb=lambda t: QM31(*(np.array([x],np.uint32) for x in t))
def draw4(d,n):
    h=sha(d+n.to_bytes(4,"little"))
    return tuple((int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(4))

d0=sha(bytes(32)+roots[0])
d0=sha((int(proof.log_size_plonk).to_bytes(4,"little")+bytes(28))+d0)
d0=sha((int(proof.log_size_poseidon).to_bytes(4,"little")+bytes(28))+d0)
d0=sha(d0+roots[1])
h=sha(d0+bytes(4))
z=tuple((int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(4))
alpha=tuple((int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(4,8))

s1=[int(x) for x in proof.plonk_total_sum]
s2=[int(x) for x in proof.poseidon_total_sum]

def fbytes(f,perm):
    return b"".join(int(f[p]).to_bytes(4,"little") for p in perm)

payload_sets={}
for perm in itertools.permutations(range(4)):
    for pad in ("none","each32","whole64"):
        a,b=fbytes(s1,perm),fbytes(s2,perm)
        if pad=="each32": a,b=a+bytes(16),b+bytes(16)
        pay=a+b
        if pad=="whole64": pay=pay+bytes(32)
        payload_sets[("1op",perm,pad)]=[pay]
for perm in (tuple(range(4)),(3,2,1,0)):
    for pad in ("none","each32"):
        a,b=fbytes(s1,perm),fbytes(s2,perm)
        if pad=="each32": a,b=a+bytes(16),b+bytes(16)
        payload_sets[("2op",perm,pad)]=[a,b]

hits=0; n=0
for key,pays in payload_sets.items():
    for cat in ("rf","df"):
        d1=d0
        for p in pays:
            d1=sha(p+d1) if cat=="rf" else sha(d1+p)
        d1=sha(d1+roots[2])
        for ctrs in ((0,0),(1,2),(2,3)):
            rc=draw4(d1,ctrs[0])
            d2=sha(d1+roots[3])
            t=draw4(d2,ctrs[1])
            ok=composition_mod.composition_check(spec,samples,
                qb(proof.plonk_total_sum),qb(proof.poseidon_total_sum),
                (qb(z),qb(alpha)),qb(rc),points.oods_point_from_t(qb(t)))
            n+=1
            if bool(np.asarray(ok)[0]):
                hits+=1
                print("STAGE A PASS:",key,cat,ctrs,flush=True)
print("done",hits,"/",n)
