"""Stage A: combinator search over stmt1 mix_felts encodings."""
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

def draw8(d,n=0):
    h=sha(d+n.to_bytes(4,"little"))
    return [(int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(8)]

d0=sha(bytes(32)+roots[0])
d0=sha((int(proof.log_size_plonk).to_bytes(4,"little")+bytes(28))+d0)
d0=sha((int(proof.log_size_poseidon).to_bytes(4,"little")+bytes(28))+d0)
d0=sha(d0+roots[1])
L=draw8(d0)
z,alpha=tuple(L[0:4]),tuple(L[4:8])

s1=[int(x) for x in proof.plonk_total_sum]
s2=[int(x) for x in proof.poseidon_total_sum]

def felt16(f,transform):
    limbs=list(f)
    if transform=="limbrev": limbs=limbs[::-1]
    b=b"".join(int(x).to_bytes(4,"little") for x in limbs)
    if transform=="bytesrev": b=b[::-1]
    if transform=="be": b=b"".join(int(x).to_bytes(4,"big") for x in list(f))
    return b

samples=flatten_samples(spec,proof)[None]
qb=lambda t: QM31(*(np.array([x],np.uint32) for x in t))
n=0
for transform in ("id","limbrev","bytesrev","be"):
    for pad in ("none","after32","before32"):
        def padf(b):
            if pad=="after32": return b+bytes(16)
            if pad=="before32": return bytes(16)+b
            return b
        for group in ("f1f2","f2f1","two"):
            for cat in ("rf","df"):
                def mixop(d,pay):
                    return sha(pay+d) if cat=="rf" else sha(d+pay)
                if group=="two":
                    d1=mixop(mixop(d0,padf(felt16(s1,transform))),padf(felt16(s2,transform)))
                elif group=="f1f2":
                    d1=mixop(d0,felt16(s1,transform)+felt16(s2,transform))
                else:
                    d1=mixop(d0,felt16(s2,transform)+felt16(s1,transform))
                d1=sha(d1+roots[2])
                rc=tuple(draw8(d1)[0:4])
                d2=sha(d1+roots[3])
                t=tuple(draw8(d2)[0:4])
                ok=composition_mod.composition_check(spec,samples,
                    qb(proof.plonk_total_sum),qb(proof.poseidon_total_sum),
                    (qb(z),qb(alpha)),qb(rc),points.oods_point_from_t(qb(t)))
                n+=1
                if bool(np.asarray(ok)[0]):
                    print("STAGE A PASS:",transform,pad,group,cat,flush=True)
print("done",n)
