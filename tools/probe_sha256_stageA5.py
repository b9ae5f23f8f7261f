"""Stage A: draw-mutation variants x stmt1 encodings."""
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

class Ch:
    """mutate: after a draw, digest <- draw hash. reset: n_sent reset on mix."""
    def __init__(s,mutate,reset):
        s.d=bytes(32); s.n=0; s.mutate=mutate; s.reset=reset
    def mix_root(s,r):
        s.d=sha(s.d+r)
        if s.reset: s.n=0
    def mix_op(s,pay):
        s.d=sha(pay+s.d)
        if s.reset: s.n=0
    def draw8(s):
        h=sha(s.d+s.n.to_bytes(4,"little")); s.n+=1
        if s.mutate: s.d=h; s.n=0
        return [(int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(8)]

s1b=feltb(proof.plonk_total_sum); s2b=feltb(proof.poseidon_total_sum)
stmt1_payloads={
 "pair": [s1b+s2b],
 "two32": [s1b+bytes(16), s2b+bytes(16)],
 "two16": [s1b, s2b],
}
hits=0
for mutate in (False,True):
    for reset in (True,False):
        for s1name,pays in stmt1_payloads.items():
            ch=Ch(mutate,reset)
            ch.mix_root(roots[0])
            ch.mix_op(feltb((proof.log_size_plonk,0,0,0))+bytes(16))
            ch.mix_op(feltb((proof.log_size_poseidon,0,0,0))+bytes(16))
            ch.mix_root(roots[1])
            L=ch.draw8(); z,alpha=tuple(L[0:4]),tuple(L[4:8])
            for p in pays: ch.mix_op(p)
            ch.mix_root(roots[2])
            rc=tuple(ch.draw8()[0:4])
            ch.mix_root(roots[3])
            t=tuple(ch.draw8()[0:4])
            ok=composition_mod.composition_check(spec,samples,
                qb(proof.plonk_total_sum),qb(proof.poseidon_total_sum),
                (qb(z),qb(alpha)),qb(rc),points.oods_point_from_t(qb(t)))
            if bool(np.asarray(ok)[0]):
                hits+=1
                print("STAGE A PASS: mutate",mutate,"reset",reset,"stmt1",s1name,flush=True)
print("done",hits)
