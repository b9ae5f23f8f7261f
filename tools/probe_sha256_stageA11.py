"""Stage A mega-sweep: mechanical stmt1 payload constructions x root2/3
mix variants x counter rules, vectorized composition oracle."""
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

def draw4(d,n,hi,rev):
    hh=sha(d+int(n).to_bytes(4,"little"))
    o=4 if hi else 0
    l=[(int.from_bytes(hh[4*i:4*i+4],"little")&0x7FFFFFFF)%P for i in range(o,o+4)]
    return tuple(l[::-1] if rev else l)

# limb arrangements of the 8 sum limbs
arr={}
base=s1+s2
arr["id"]=base
arr["feltrev"]=s1[::-1]+s2[::-1]
arr["swap"]=s2+s1
arr["swap_feltrev"]=s2[::-1]+s1[::-1]
arr["fullrev"]=base[::-1]
# per-limb encodings
encs={"le":lambda x:int(x).to_bytes(4,"little"),"be":lambda x:int(x).to_bytes(4,"big")}
# op splits: list of per-op limb counts
splits={"1x8":[8],"2x4":[4,4],"4x2":[2,2,2,2],"8x1":[1]*8}
pads={"none":None,"to32":32,"hi32":-32}
d1_set={}
for aname,limbs in arr.items():
    for ename,enc in encs.items():
        for spname,spl in splits.items():
            for pname,pad in pads.items():
                for cat in ("rf","df"):
                    d=d0; i=0
                    for cnt in spl:
                        pay=b"".join(enc(x) for x in limbs[i:i+cnt]); i+=cnt
                        if pad==32: pay=pay.ljust(32,b"\0")
                        elif pad==-32: pay=bytes(32-len(pay))+pay
                        d=sha(pay+d) if cat=="rf" else sha(d+pay)
                    d1_set[(aname,ename,spname,pname,cat)]=d
print("stmt1 variants:",len(d1_set))

root_mix={"df":lambda d,r: sha(d+r),"rf":lambda d,r: sha(r+d)}
cands=[]
for skey,dm in d1_set.items():
    for r23 in ("df","rf"):
        rm=root_mix[r23]
        d1=rm(dm,roots[2]); d2=rm(d1,roots[3])
        for ctrs in ((0,0),(1,2)):
            for hi in (False,True):
                rc=draw4(d1,ctrs[0],hi,False)
                t=draw4(d2,ctrs[1],hi,False)
                cands.append(((skey,r23,ctrs,hi),rc,t))
print("total candidates:",len(cands))

tile=lambda tpl,B: QM31(*(np.full(B,v,np.uint32) for v in tpl))
CH=4096
found=0
for off in range(0,len(cands),CH):
    batch=cands[off:off+CH]; B=len(batch)
    samples=np.broadcast_to(samples1[None],(B,)+samples1.shape).copy()
    rcq=QM31(*(np.array([c[1][k] for c in batch],np.uint32) for k in range(4)))
    tq=QM31(*(np.array([c[2][k] for c in batch],np.uint32) for k in range(4)))
    ok=np.asarray(composition_mod.composition_check(spec,samples,
        tile(tuple(s1),B),tile(tuple(s2),B),(tile(z,B),tile(alpha,B)),rcq,
        points.oods_point_from_t(tq)))
    for i in np.nonzero(ok)[0]:
        found+=1
        print("STAGE A PASS:",batch[i][0],flush=True)
print("done",found,"/",len(cands))
