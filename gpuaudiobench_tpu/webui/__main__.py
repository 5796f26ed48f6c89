"""`python -m gpuaudiobench_tpu.webui` entry point."""

from gpuaudiobench_tpu.webui.server import main

raise SystemExit(main())
