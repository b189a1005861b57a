"""Stage orchestrators mirroring the reference's four entry points
(prepare_data / PMVO / infer_inner / HairGrow) as function calls over a shared
case directory — no subprocess hops (the reference shells out between stages,
prepare_data.py:103-125, infer_inner.py:89-90)."""
