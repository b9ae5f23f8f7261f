"""Stages A/B: with stage-0 semantics locked, pin down mix_felts chunking,
draw_felt position, nonce encoding, and the PoW rule for Sha256Channel."""
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

def feltb(f): return b"".join(int(x).to_bytes(4,"little") for x in f)

class Ch:
    def __init__(s): s.d=bytes(32); s.n=0
    def mix_root(s,r): s.d=sha(s.d+r); s.n=0
    def mix_op(s,payload32): s.d=sha(payload32+s.d); s.n=0   # felt ops
    def mix_felts_pairs(s,felts):
        felts=[tuple(int(x) for x in f) for f in felts]
        for i in range(0,len(felts),2):
            c=felts[i:i+2]
            pay=feltb(c[0])+(feltb(c[1]) if len(c)==2 else bytes(16))
            s.mix_op(pay)
    def draw8(s):
        h=sha(s.d+s.n.to_bytes(4,"little")); s.n+=1
        return [ (int.from_bytes(h[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(8)]
    def draw_u32s(s):
        h=sha(s.d+s.n.to_bytes(4,"little")); s.n+=1
        return [int.from_bytes(h[4*i:4*i+4],"little") for i in range(8)]
    def fork(s):
        c=Ch(); c.d,c.n=s.d,s.n; return c

ch=Ch()
ch.mix_root(roots[0])
ch.mix_felts_pairs([(proof.log_size_plonk,0,0,0)])
ch.mix_felts_pairs([(proof.log_size_poseidon,0,0,0)])
ch.mix_root(roots[1])
limbs=ch.draw8()
z,alpha=tuple(limbs[0:4]),tuple(limbs[4:8])
ch.mix_felts_pairs([proof.plonk_total_sum,proof.poseidon_total_sum])
ch.mix_root(roots[2])
rc=tuple(ch.draw8()[0:4])
ch.mix_root(roots[3])
oods_t=tuple(ch.draw8()[0:4])

samples=flatten_samples(spec,proof)[None]
qb=lambda t: QM31(*(np.array([x],np.uint32) for x in t))
ok=composition_mod.composition_check(spec,samples,qb(proof.plonk_total_sum),
    qb(proof.poseidon_total_sum),(qb(z),qb(alpha)),qb(rc),
    points.oods_point_from_t(qb(oods_t)))
print("STAGE A (composition):",bool(np.asarray(ok)[0]))

sampled=[tuple(int(x) for x in row) for tree in sp.sampled_values for col in tree for row in col]
ch.mix_felts_pairs(sampled)
after=tuple(ch.draw8()[0:4])
alphas=[]
ch.mix_root(bytes(np.asarray(sp.fri_proof.first_layer.commitment,np.uint8)))
alphas.append(tuple(ch.draw8()[0:4]))
for layer in sp.fri_proof.inner_layers:
    ch.mix_root(bytes(np.asarray(layer.commitment,np.uint8)))
    alphas.append(tuple(ch.draw8()[0:4]))
ch.mix_felts_pairs([tuple(int(x) for x in r) for r in sp.fri_proof.last_layer_poly])

nonce=sp.proof_of_work
for enc_name,pay in {
  "felt221":feltb((nonce&((1<<22)-1),(nonce>>22)&((1<<21)-1),(nonce>>43)&((1<<21)-1),0))+bytes(16),
  "le8pad":nonce.to_bytes(8,"little")+bytes(24),
}.items():
    c=ch.fork(); c.mix_op(pay)
    x=int.from_bytes(c.d[:16],"little")
    tz=128 if x==0 else (x&-x).bit_length()-1
    x0=int.from_bytes(c.d[0:4],"little")
    tz32=32 if x0==0 else (x0&-x0).bit_length()-1
    print(f"STAGE B nonce={enc_name}: trailing128={tz} trailing32={tz32} (need >= {spec.pow_bits})")
    if tz>=spec.pow_bits:
        raw=[]
        while len(raw)<spec.n_queries: raw.extend(c.draw_u32s())
        raw=raw[:spec.n_queries]
        M=spec.max_first_layer_log
        print("   raw queries masked:",[r&((1<<M)-1) for r in raw])
