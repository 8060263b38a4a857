from .arena import OpTestCase, run_arena
