"""Sources: pages-table builders (fixture corpus, deterministic
synthetic corpus), seed lists, and package (zip/tar) expansion."""
