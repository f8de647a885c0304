from blink.benchmarks.harness import bench_render, bench_render_grad, run_bench

__all__ = ["bench_render", "bench_render_grad", "run_bench"]
