"""Stage A: single-felt draw function variants x stmt1 encodings."""
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

def limbs_of(h,o=0):
    return tuple((int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(o,o+4))

d0=sha(bytes(32)+roots[0])
d0=sha((feltb((proof.log_size_plonk,0,0,0))+bytes(16))+d0)
d0=sha((feltb((proof.log_size_poseidon,0,0,0))+bytes(16))+d0)
d0=sha(d0+roots[1])
h=sha(d0+(0).to_bytes(4,"little"))
z,alpha=limbs_of(h,0),limbs_of(h,4)

s1b=feltb(proof.plonk_total_sum); s2b=feltb(proof.poseidon_total_sum)
def perlimb32(d,limbs):
    for x in limbs:
        d=sha((int(x).to_bytes(4,"little")+bytes(28))+d)
    return d
allimbs=[int(x) for x in proof.plonk_total_sum]+[int(x) for x in proof.poseidon_total_sum]
stmt1_modes={
 "pair": lambda d: sha(s1b+s2b+d),
 "two32": lambda d: sha((s2b+bytes(16))+sha((s1b+bytes(16))+d)),
 "two16": lambda d: sha(s2b+sha(s1b+d)),
 "perlimb32": lambda d: perlimb32(d,allimbs),
}
single_draws={
 "ctr4": lambda d: limbs_of(sha(d+(0).to_bytes(4,"little")),0),
 "ctr4_hi": lambda d: limbs_of(sha(d+(0).to_bytes(4,"little")),4),
 "plainhash": lambda d: limbs_of(sha(d),0),
 "plainhash_hi": lambda d: limbs_of(sha(d),4),
 "direct": lambda d: limbs_of(d,0),
 "direct_hi": lambda d: limbs_of(d,4),
 "tag00": lambda d: limbs_of(sha(d+b"\x00"),0),
 "ctr8": lambda d: limbs_of(sha(d+(0).to_bytes(8,"little")),0),
}
hits=0
for s1name,s1 in stmt1_modes.items():
    d1=sha(s1(d0)+roots[2])
    for dname,dfn in single_draws.items():
        rc=dfn(d1)
        d2=sha(d1+roots[3])
        t=dfn(d2)
        ok=composition_mod.composition_check(spec,samples,
            qb(proof.plonk_total_sum),qb(proof.poseidon_total_sum),
            (qb(z),qb(alpha)),qb(rc),points.oods_point_from_t(qb(t)))
        if bool(np.asarray(ok)[0]):
            hits+=1
            print("STAGE A PASS:",s1name,dname,flush=True)
print("done",hits)
