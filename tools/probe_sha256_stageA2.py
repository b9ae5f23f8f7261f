"""Pin stmt1 mixing + rc/oods draw positions via composition oracle."""
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
feltb=lambda f: b"".join(int(x).to_bytes(4,"little") for x in f)

def draw8(d,n=0):
    h=sha(d+n.to_bytes(4,"little"))
    return [(int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(8)]

# replay to post-z/alpha state (validated stage 0)
d=sha(bytes(32)+roots[0])
d=sha((feltb((proof.log_size_plonk,0,0,0))+bytes(16))+d)
d=sha((feltb((proof.log_size_poseidon,0,0,0))+bytes(16))+d)
d=sha(d+roots[1])
limbs=draw8(d)
z,alpha=tuple(limbs[0:4]),tuple(limbs[4:8])

f1=feltb(proof.plonk_total_sum); f2=feltb(proof.poseidon_total_sum)
stmt1_modes={
 "pair_rf": lambda d: sha(f1+f2+d),
 "pair_df": lambda d: sha(d+f1+f2),
 "pair_rev_rf": lambda d: sha(f2+f1+d),
 "two_rf": lambda d: sha((f2+bytes(16))+sha((f1+bytes(16))+d)),
 "two_df": lambda d: sha(sha(d+f1)+f2),
}
samples=flatten_samples(spec,proof)[None]
qb=lambda t: QM31(*(np.array([x],np.uint32) for x in t))
for s1name,s1 in stmt1_modes.items():
    d1=s1(d); d1=sha(d1+roots[2])
    for rc_hi in (False,True):
        L=draw8(d1); rc=tuple(L[4:8] if rc_hi else L[0:4])
        d2=sha(d1+roots[3])
        for oods_hi in (False,True):
            L2=draw8(d2); t=tuple(L2[4:8] if oods_hi else L2[0:4])
            ok=composition_mod.composition_check(spec,samples,
                qb(proof.plonk_total_sum),qb(proof.poseidon_total_sum),
                (qb(z),qb(alpha)),qb(rc),points.oods_point_from_t(qb(t)))
            if bool(np.asarray(ok)[0]):
                print("STAGE A PASS:",s1name,"rc_hi",rc_hi,"oods_hi",oods_hi,flush=True)
print("done")
