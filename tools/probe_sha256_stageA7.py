"""Stage A: mix_felts = prehash(felts) combined with digest."""
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
feltb=lambda f: b"".join(int(x).to_bytes(4,"little") for x in f)
samples=flatten_samples(spec,proof)[None]
qb=lambda t: QM31(*(np.array([x],np.uint32) for x in t))
def draw8(d,n=0):
    h=sha(d+n.to_bytes(4,"little"))
    return [(int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(8)]

d0=sha(bytes(32)+roots[0])
d0=sha((int(proof.log_size_plonk).to_bytes(4,"little")+bytes(28))+d0)
d0=sha((int(proof.log_size_poseidon).to_bytes(4,"little")+bytes(28))+d0)
d0=sha(d0+roots[1])
L=draw8(d0); z,alpha=tuple(L[0:4]),tuple(L[4:8])

s1b=feltb(proof.plonk_total_sum); s2b=feltb(proof.poseidon_total_sum)
inners={
 "cat": sha(s1b+s2b),
 "cat_pad": sha(s1b+bytes(16)+s2b+bytes(16)),
 "chain": sha(sha(s1b)+s2b),
 "chain2": sha(sha(s1b+bytes(16))+s2b+bytes(16)),
 "merkle": sha(sha(s1b)+sha(s2b)),
}
outers={
 "d_first": lambda d,i: sha(d+i),
 "i_first": lambda d,i: sha(i+d),
}
hits=0
for iname,inner in inners.items():
    for oname,outer in outers.items():
        d1=sha(outer(d0,inner)+roots[2])
        rc=tuple(draw8(d1)[0:4])
        d2=sha(d1+roots[3])
        t=tuple(draw8(d2)[0:4])
        ok=composition_mod.composition_check(spec,samples,
            qb(proof.plonk_total_sum),qb(proof.poseidon_total_sum),
            (qb(z),qb(alpha)),qb(rc),points.oods_point_from_t(qb(t)))
        if bool(np.asarray(ok)[0]):
            hits+=1
            print("STAGE A PASS:",iname,oname,flush=True)
print("done",hits)
