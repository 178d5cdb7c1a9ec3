M = 1 << 64
P1 = 0x9E3779B185EBCA87; P2 = 0xC2B2AE3D27D4EB4F; P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63; P5 = 0x27D4EB2F165667C5
def rotl(x, r): return ((x << r) | (x >> (64 - r))) & (M - 1)
def xxh64(data: bytes, seed=42):
    n = len(data); i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) % M; v2 = (seed + P2) % M; v3 = seed % M; v4 = (seed - P1) % M
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i+8*j:i+8*j+8], 'little')
                v = (v + lane * P2) % M; v = rotl(v, 31); v = (v * P1) % M
                if j == 0: v1 = v
                elif j == 1: v2 = v
                elif j == 2: v3 = v
                else: v4 = v
            i += 32
        h = (rotl(v1,1) + rotl(v2,7) + rotl(v3,12) + rotl(v4,18)) % M
        for v in (v1, v2, v3, v4):
            k = (v * P2) % M; k = rotl(k, 31); k = (k * P1) % M
            h ^= k; h = (h * P1 + P4) % M
    else:
        h = (seed + P5) % M
    h = (h + n) % M
    while i + 8 <= n:
        k = int.from_bytes(data[i:i+8], 'little')
        k = (k * P2) % M; k = rotl(k, 31); k = (k * P1) % M
        h ^= k; h = rotl(h, 27); h = (h * P1 + P4) % M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i+4], 'little')
        h ^= (k * P1) % M; h = rotl(h, 23); h = (h * P2 + P3) % M
        i += 4
    while i < n:
        h ^= (data[i] * P5) % M; h = rotl(h, 11); h = (h * P1) % M
        i += 1
    h ^= h >> 33; h = (h * P2) % M; h ^= h >> 29; h = (h * P3) % M; h ^= h >> 32
    return h
def signed(h): return h - M if h >= (1 << 63) else h
