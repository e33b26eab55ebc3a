"""Communication-volume model for the sharded quad fast path.

Real multi-chip hardware is not available in this environment (one v5e chip
over a tunnel), so this publishes the arithmetic a reviewer can check
against ICI bandwidth instead: bytes moved per step over the 1-D ("dy",)
mesh of parallel.quad_sharded.ShardedQuadProjection vs the FLOPs/HBM work
each chip keeps, and the predicted scaling efficiency at 2/4/8/16 chips.

Per-step communication (module docstring, parallel/quad_sharded.py):
* 1 halo refresh of the tentative-carry arrays before the fused step
  kernel (cavity/channel: 4 quad-stacked fields; RB: 4; step: 3), each a
  bidirectional ppermute of DEV_HALO=8 plane rows x 4 planes x Wqa f32;
* per V-cycle: 3 halo refreshes (p, rc, ec) + one tiled all_gather of the
  level-2 source ((Hq8s/2) x (Wqa/2) f32, each chip receiving the other
  (mdy-1)/mdy of it) + pmax/psum scalars (negligible);
* the coarse tail below level 2 runs REPLICATED (identical redundant
  FLOPs on every chip) — counted as lost parallel efficiency, not bytes.

Model: t_step(mdy) = t_compute_1chip / (mdy * builder_eff)
                       * (1 + tail_frac * (mdy - 1))
                     + bytes_moved / ICI_BW
with t_compute_1chip from the measured single-chip steps/s (BASELINE.md),
builder_eff the MEASURED sharded-program bookkeeping efficiency (the
1-device-mesh forced-sharded rate / single-device rate, BASELINE.md
round-4 sharded-native row: the extended-halo band bookkeeping every
communicating mesh pays; at mdy == 1 the engine now delegates to the
single-device program and pays none of it — quad_sharded mdy==1
delegation), tail_frac = the replicated fraction of per-step work (cells
below level 2 x cycles / total cell-work), and ICI_BW the per-chip ICI
budget actually usable by a 1-D ring (2 of the v5e's 4 links ~= 100 GB/s
out of ~200 aggregate; both directions counted since ppermute sends
north+south concurrently). Efficiency = t_1 / (mdy * t_mdy).
Collective COUNT per step is 2 + 6*cycles after the fused carry-field
refresh (_refresh_many stacks the 3-4 carry strips into one ppermute
pair); byte volume is unchanged, so the bandwidth terms below are
unaffected — the fusion cuts per-collective launch latency only.

Reference anchor: SURVEY.md section 5.7-5.8 (spatial decomposition /
comm backend); the OpenFOAM decomposePar role the reference README
describes (/root/reference/README.md:129-131).
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from cfd_tpu.kernels.quad import quad_shard_dims

V5E_ICI_RING_GBPS = 100.0e9   # 2 of 4 links usable by a 1-D ring, B/s
DEV_HALO = 8

# Measured single-chip steady state, HONEST post-stall-fix numbers
# (BASELINE.md round-4/5 quiet-machine rows: the round-3 channel/step
# figures this table once embedded were retracted as unconverged runs).
# builder_eff: forced-sharded 1-device rate / single-device rate
# (BASELINE.md round-4 sharded-native row) — the band-bookkeeping cost a
# communicating mesh pays on top of the comm itself.
CASES = {
    "cavity": dict(shape=(2050, 2050), carry_fields=4, cycles=1.0,
                   steps_per_sec=1203.0, builder_eff=0.79),
    "channel": dict(shape=(514, 1538), carry_fields=4, cycles=2.1,
                    steps_per_sec=2562.0, builder_eff=0.73),
    "rb": dict(shape=(514, 1538), carry_fields=4, cycles=2.1,
               steps_per_sec=2682.0, builder_eff=0.65),
    "step": dict(shape=(258, 2050), carry_fields=3, cycles=4.1,
                 steps_per_sec=1835.0, builder_eff=0.78),
}


def model(name, shape, carry_fields, cycles, steps_per_sec, mdy,
          builder_eff=1.0):
    Hq8s, P, Wqa = quad_shard_dims(shape, mdy)
    f32 = 4
    # one halo refresh of one 4-plane quad field: 8 rows x 4 planes x Wqa,
    # sent both directions
    strip = DEV_HALO * 4 * Wqa * f32 * 2
    halo_refreshes = carry_fields + 3 * cycles     # step kernel + per-cycle
    halo_bytes = halo_refreshes * strip
    # level-2 source all_gather: (Hq8s/2) x (Wqa/2) f32, receive (mdy-1)/mdy
    ag_bytes = cycles * (Hq8s / 2) * (Wqa / 2) * f32 * (mdy - 1) / mdy
    bytes_per_step = halo_bytes + ag_bytes
    t_comm = bytes_per_step / V5E_ICI_RING_GBPS

    # replicated-tail fraction: cells below level 2 vs total per-cycle
    # cell-work (geometric level sum ~ 4/3 of the fine level); the fine
    # level holds Hq8s*Wqa*4 quad cells, level tail starts at 1/16 of it
    tail_frac = (1.0 / 16.0) / (4.0 / 3.0)
    t1 = 1.0 / steps_per_sec
    t_mdy = (t1 / (mdy * builder_eff) * (1 + tail_frac * (mdy - 1))
             + t_comm)
    eff = t1 / (mdy * t_mdy)
    return dict(case=name, mdy=mdy, builder_eff=builder_eff,
                bytes_per_step=int(bytes_per_step),
                comm_us=round(t_comm * 1e6, 1),
                compute_us=round(t1 / mdy * 1e6, 1),
                tail_frac=round(tail_frac, 4),
                steps_per_sec=round(1.0 / t_mdy, 1),
                efficiency=round(eff, 3))


if __name__ == "__main__":
    for name, kw in CASES.items():
        for mdy in (2, 4, 8, 16):
            print(json.dumps(model(name, mdy=mdy, **kw)))
