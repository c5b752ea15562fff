import cProfile, pstats, io, time
from cirkit_tpu.models import image_data
from cirkit_tpu.pipeline import PipelineContext

t0 = time.time()
sc = image_data((1,28,28), "quad-graph", input_layer="categorical",
                num_input_units=64, sum_product_layer="tucker", num_sum_units=64)
print("symbolic build:", time.time()-t0, flush=True)
ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
pr = cProfile.Profile()
pr.enable()
cc = ctx.compile(sc)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
print("\n".join(s.getvalue().splitlines()[:40]))
