"""Device kernels: attention, top-k, l2-normalize, k-means, PQ/ADC scans."""
