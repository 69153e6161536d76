#!/bin/sh
# Build the native EXR bridge over the system OpenEXR.
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -shared -fPIC -pthread exrio.cpp \
    -I/usr/include/OpenEXR -I/usr/include/Imath \
    -lOpenEXR-3_1 -lIex-3_1 -lIlmThread-3_1 -lImath-3_1 \
    -o libexrio.so
