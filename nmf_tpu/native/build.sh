#!/bin/sh
# Build the native host data path. Called automatically on first import.
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -pthread raystore.cpp -o libraystore.so
