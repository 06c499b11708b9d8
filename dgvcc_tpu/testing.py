"""Shared tiny model geometry for tests and the multi-chip dryrun.

One definition so the dryrun (`__graft_entry__.py`), the model tests,
and the two multihost processes (parent + spawned worker) can never
silently diverge on the geometry whose outputs they compare.

Tiny DG geometry: 4-conv VGG plan (stride 4/8/16 stages preserved),
thin decoder, 16-slot memory. Layout indices: conv=3 slots (conv/bn/
relu), pool=1 — splits (0,8,12,16) give the same 3-stage contract as
torchvision's [:23]/[23:33]/[33:43]
(`/root/reference/models/models.py:35-38`).
"""

TINY_VGG = (8, "M", 8, "M", 16, "M", 16, "M")
TINY = dict(
    vgg_cfg=TINY_VGG,
    stage_splits=(0, 8, 12, 16),
    dec_widths=((16, 16), (16, 16), (16, 8)),
)
TINY_MEM = dict(TINY, mem_size=16, mem_dim=16)
# plain-VGG19 plan for the Generator (no BN: conv=2 slots, pool=1);
# stop=9 ends at stride 8 like torchvision features[:26]
TINY_VGG19 = (8, "M", 8, "M", 16, "M")
