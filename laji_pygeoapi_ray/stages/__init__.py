"""map_batches stage callables: plain functions → stateless Ray tasks,
callable classes → actor pools (state built once per actor in __init__)."""
