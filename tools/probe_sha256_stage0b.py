"""Stage-0 probe, fully decoupled per-method: root-op x stmt0-op x draw
enumerated independently (including mixed concatenation orders and
challenge-counter suffixes).  Run: python tools/probe_sha256_stage0b.py"""
import hashlib, itertools, os, sys
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from recursive_stwo_tpu.proof.parse import parse_plonk_with_poseidon_proof

HERE = os.path.dirname(__file__)
FIXTURE = os.path.join(HERE, "..", "recursive_stwo_tpu", "testdata", "hybrid_hash.bin")
P = 2147483647
sha = lambda b: hashlib.sha256(b).digest()

def cmulx(a,b,c,d): return ((a*c-b*d)%P,(a*d+b*c)%P)
def qmul(x,y):
    pr=cmulx(x[0],x[1],y[0],y[1]); qs=cmulx(x[2],x[3],y[2],y[3])
    ps=cmulx(x[0],x[1],y[2],y[3]); qr=cmulx(x[2],x[3],y[0],y[1])
    return ((pr[0]+2*qs[0]-qs[1])%P,(pr[1]+2*qs[1]+qs[0])%P,(ps[0]+qr[0])%P,(ps[1]+qr[1])%P)
def qadd(x,y): return tuple((a+b)%P for a,b in zip(x,y))
def qsub(x,y): return tuple((a-b)%P for a,b in zip(x,y))
INPUTS=((1,(1,0,0,0)),(2,(0,1,0,0)),(3,(0,0,1,0)))
def btc_num(v):
    if v==0: return b""
    out=bytearray()
    while v: out.append(v&0xFF); v>>=8
    if out[-1]&0x80: out.append(0)
    return bytes(out)

data=open(FIXTURE,"rb").read()
proof=parse_plonk_with_poseidon_proof(data,hash_mode="bytes32")
S=qadd(tuple(int(x) for x in proof.plonk_total_sum),tuple(int(x) for x in proof.poseidon_total_sum))
def check(z,alpha):
    ts=[]
    for idx,val in INPUTS:
        ia=tuple(v*idx%P for v in alpha); ts.append(qsub(qadd(val,ia),z))
    t1,t2,t3=ts
    lhs=qadd(qadd(qmul(t2,t3),qmul(t1,t3)),qmul(t1,t2))
    return qadd(lhs,qmul(S,qmul(t1,qmul(t2,t3))))==(0,0,0,0)

roots=[bytes(np.asarray(h,np.uint8)) for h in proof.stark_proof.commitments]
lp,lq=proof.log_size_plonk,proof.log_size_poseidon

# root-op: digest, root -> digest'
def mk_root_ops():
    ops={}
    for order in ("df","rf"):
        for rev in (False,True):
            for suf in (b"", b"\x00"):
                def f(d,r,order=order,rev=rev,suf=suf):
                    rr=r[::-1] if rev else r
                    return sha(d+rr+suf) if order=="df" else sha(rr+d+suf)
                ops[f"cat_{order}_{rev}_{suf.hex()}"]=f
    ops["replace"]=lambda d,r: r
    ops["hash_alone"]=lambda d,r: sha(r)
    return ops

# stmt0-op: digest -> digest' (mix both log sizes)
def mk_stmt0_ops():
    ops={}
    encs={
        "u32le16":lambda v:int(v).to_bytes(4,"little").ljust(16,b"\0"),
        "u32be16":lambda v:bytes(12)+int(v).to_bytes(4,"big"),
        "u32le32":lambda v:int(v).to_bytes(4,"little").ljust(32,b"\0"),
        "le8":lambda v:int(v).to_bytes(8,"little"),
        "be8":lambda v:int(v).to_bytes(8,"big"),
        "le4":lambda v:int(v).to_bytes(4,"little"),
        "be4":lambda v:int(v).to_bytes(4,"big"),
        "btc":lambda v:btc_num(v),
    }
    for name,e in encs.items():
        for order in ("df","rf"):
            def f(d,e=e,order=order):
                for v in (lp,lq):
                    d=sha(d+e(v)) if order=="df" else sha(e(v)+d)
                return d
            ops[f"{name}_{order}"]=f
    def onecall(d): return sha(d+int(lp).to_bytes(4,"little")+int(lq).to_bytes(4,"little"))
    ops["one_le4"]=onecall
    return ops

# draw: digest -> (z, alpha)
def mk_draws():
    draws={}
    for gran in (1,2,4,8):
        for adv in ("selfhash","tag00","c4","c8"):
            for src in ("pre","post"):
                if adv.startswith("c") and src=="post": continue
                for enc in ("le","be"):
                    for rev in (False,True):
                        for red in ("mask31","modp","shr1"):
                            for win in ("first","last"):
                                def f(d,gran=gran,adv=adv,src=src,enc=enc,rev=rev,red=red,win=win):
                                    o="little" if enc=="le" else "big"
                                    state,ctr=d,0; limbs=[]
                                    while len(limbs)<8:
                                        if adv=="selfhash": nxt=sha(state)
                                        elif adv=="tag00": nxt=sha(state+b"\x00")
                                        elif adv=="c4": nxt=sha(state+ctr.to_bytes(4,"little"))
                                        else: nxt=sha(state+ctr.to_bytes(8,"little"))
                                        if adv.startswith("c"): srcb=nxt; ctr+=1
                                        else:
                                            srcb=state if src=="pre" else nxt; state=nxt
                                        s=srcb[::-1] if rev else srcb
                                        nb=4*gran
                                        chunk=s[:nb] if win=="first" else s[32-nb:]
                                        for i in range(gran):
                                            x=int.from_bytes(chunk[4*i:4*i+4],o)
                                            limbs.append((x&0x7FFFFFFF)%P if red=="mask31" else x%P if red=="modp" else x>>1)
                                    return limbs
                                draws[(gran,adv,src,enc,rev,red,win)]=f
    # u64-based
    for adv in ("selfhash","tag00","c4","c8"):
        for src in ("pre","post"):
            if adv.startswith("c") and src=="post": continue
            for enc in ("le","be"):
                def f(d,adv=adv,src=src,enc=enc):
                    o="little" if enc=="le" else "big"
                    state,ctr=d,0; limbs=[]
                    while len(limbs)<8:
                        if adv=="selfhash": nxt=sha(state)
                        elif adv=="tag00": nxt=sha(state+b"\x00")
                        elif adv=="c4": nxt=sha(state+ctr.to_bytes(4,"little"))
                        else: nxt=sha(state+ctr.to_bytes(8,"little"))
                        if adv.startswith("c"): srcb=nxt; ctr+=1
                        else:
                            srcb=state if src=="pre" else nxt; state=nxt
                        for i in range(4):
                            limbs.append(int.from_bytes(srcb[8*i:8*i+8],o)%P)
                    return limbs
                draws[("u64",adv,src,enc,False,"modp","first")]=f
    return draws

root_ops=mk_root_ops(); stmt0_ops=mk_stmt0_ops(); draws=mk_draws()
print(f"space: {len(root_ops)} root x {len(stmt0_ops)} stmt0 x {len(draws)} draws x 2 zswap")
n=0; hits=0
for rname,rop in root_ops.items():
    for sname,sop in stmt0_ops.items():
        d=rop(rop(bytes(32),roots[0]) if False else rop(bytes(32),roots[0]),roots[1])
        # recompute properly: root0 -> stmt0 -> root1
        d=rop(bytes(32),roots[0]); d=sop(d); d=rop(d,roots[1])
        for dname,dop in draws.items():
            limbs=dop(d)
            for zswap in (False,True):
                z=tuple(limbs[4:8] if zswap else limbs[0:4])
                a=tuple(limbs[0:4] if zswap else limbs[4:8])
                n+=1
                if check(z,a):
                    hits+=1
                    print("PASS:",rname,sname,dname,"zswap",zswap,flush=True)
print(f"done: {hits} hits / {n} checks")
