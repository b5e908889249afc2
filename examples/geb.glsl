float polygon2d_269826b252(vec2 p) {
vec2 v[30] = vec2[30](vec2(0.35109448,0.061347928),vec2(0.35109448,0.17684332),vec2(0.25604838,0.17684332),vec2(0.25604838,0.22465438),vec2(0.40869814,0.22465438),vec2(0.40869814,0.040034562),vec2(0.3343894,0.003888249),vec2(0.24769585,-0.008352535),vec2(0.1578701,0.006372408),vec2(0.09000576,0.050547235),vec2(0.04734303,0.12100375),vec2(0.03312212,0.21457373),vec2(0.04734303,0.30835974),vec2(0.09000576,0.37888825),vec2(0.1578701,0.42306307),vec2(0.24769585,0.437788),vec2(0.32762095,0.42741936),vec2(0.39746544,0.3968894),vec2(0.39746544,0.33496544),vec2(0.32891706,0.37615207),vec2(0.25259218,0.38997695),vec2(0.18350375,0.37896025),vec2(0.13407259,0.34591013),vec2(0.104370676,0.29104263),vec2(0.09447005,0.21457373),vec2(0.104370676,0.13832085),vec2(0.13407259,0.083525345),vec2(0.18350375,0.05047523),vec2(0.25259218,0.039458524),vec2(0.3076037,0.044786867));
float d = dot(p-v[0],p-v[0]);
float s = 1.0;
for (int i=0, j=29; i<30; j=i, i++) {
  vec2 e = v[j]-v[i];
  vec2 w = p-v[i];
  vec2 b = w - e*clamp(dot(w,e)/dot(e,e),0.0,1.0);
  d = min(d, dot(b,b));
  bvec3 cond = bvec3(p.y>=v[i].y, p.y<v[j].y, e.x*w.y>e.y*w.x);
  if (all(cond) || all(not(cond))) s = -s;
}
return s*sqrt(d);
}

float translate2d_1ed865b6e2(vec2 p) {
return polygon2d_269826b252(p-vec2(-0.22091013,-0.21471775));
}

float offset2d_85e90a424d(vec2 p) {
return translate2d_1ed865b6e2(p)+(-0.01);
}

float extrusion_c49f181f2a(vec3 p) {
float d = offset2d_85e90a424d(p.xy);
vec2 w = vec2(d, abs(p.z)-0.22307028);
return min(max(w.x,w.y),0.0)+length(max(w,0.0));
}

float transform_2f2c3be98b(vec3 p) {
return extrusion_c49f181f2a(mat3(vec3(0.8418334,0.0,0.0),vec3(0.0,1.0,0.0),vec3(0.0,0.0,1.0))*p+vec3(0.0,0.0,0.0));
}

float offset_4068fd54ec(vec3 p) {
return transform_2f2c3be98b(p)+(-0.025);
}

float polygon2d_4ab389ea43(vec2 p) {
vec2 v[12] = vec2[12](vec2(0.057891704,0.4300115),vec2(0.32978112,0.4300115),vec2(0.32978112,0.38104838),vec2(0.116071425,0.38104838),vec2(0.116071425,0.25374424),vec2(0.32085255,0.25374424),vec2(0.32085255,0.2047811),vec2(0.116071425,0.2047811),vec2(0.116071425,0.048963133),vec2(0.33496544,0.048963133),vec2(0.33496544,0.0),vec2(0.057891704,0.0));
float d = dot(p-v[0],p-v[0]);
float s = 1.0;
for (int i=0, j=11; i<12; j=i, i++) {
  vec2 e = v[j]-v[i];
  vec2 w = p-v[i];
  vec2 b = w - e*clamp(dot(w,e)/dot(e,e),0.0,1.0);
  d = min(d, dot(b,b));
  bvec3 cond = bvec3(p.y>=v[i].y, p.y<v[j].y, e.x*w.y>e.y*w.x);
  if (all(cond) || all(not(cond))) s = -s;
}
return s*sqrt(d);
}

float translate2d_210b99dafb(vec2 p) {
return polygon2d_4ab389ea43(p-vec2(-0.19642857,-0.21500576));
}

float offset2d_7a1147b2ad(vec2 p) {
return translate2d_210b99dafb(p)+(-0.01);
}

float extrusion_fc5e86d687(vec3 p) {
float d = offset2d_7a1147b2ad(p.xy);
vec2 w = vec2(d, abs(p.z)-0.22307028);
return min(max(w.x,w.y),0.0)+length(max(w,0.0));
}

float transform_6d04865567(vec3 p) {
return extrusion_fc5e86d687(mat3(vec3(0.6210459,0.0,0.0),vec3(0.0,0.96384764,0.0),vec3(0.0,0.0,1.0))*p+vec3(0.0,0.0,0.0));
}

float offset_89dccb6616(vec3 p) {
return transform_6d04865567(p)+(-0.025);
}

float transform_4363d3aeca(vec3 p) {
return offset_89dccb6616(mat3(vec3(0.00000000000000006123234,0.0,1.0),vec3(-0.0,1.0,0.0),vec3(-1.0,0.0,0.00000000000000006123234))*p+vec3(-0.0,0.0,0.0));
}

float intersection_a27c5fe6b1(vec3 p) {
return max(offset_4068fd54ec(p),transform_4363d3aeca(p));
}

float polygon2d_8c84162740(vec2 p) {
vec2 v[19] = vec2[19](vec2(0.057891704,0.4300115),vec2(0.20650922,0.4300115),vec2(0.265409,0.42309907),vec2(0.30904377,0.40236175),vec2(0.3360455,0.36887962),vec2(0.34504607,0.3237327),vec2(0.3404378,0.28830644),vec2(0.3266129,0.2609447),vec2(0.30385944,0.2420075),vec2(0.27246544,0.23185484),vec2(0.31059188,0.21763393),vec2(0.3391417,0.19340438),vec2(0.35696286,0.16053428),vec2(0.36290324,0.120391704),vec2(0.3531106,0.06934044),vec2(0.3237327,0.03139401),vec2(0.27628168,0.007848502),vec2(0.21226959,0.0),vec2(0.057891704,0.0));
float d = dot(p-v[0],p-v[0]);
float s = 1.0;
for (int i=0, j=18; i<19; j=i, i++) {
  vec2 e = v[j]-v[i];
  vec2 w = p-v[i];
  vec2 b = w - e*clamp(dot(w,e)/dot(e,e),0.0,1.0);
  d = min(d, dot(b,b));
  bvec3 cond = bvec3(p.y>=v[i].y, p.y<v[j].y, e.x*w.y>e.y*w.x);
  if (all(cond) || all(not(cond))) s = -s;
}
return s*sqrt(d);
}

float polygon2d_d74e13343e(vec2 p) {
vec2 v[11] = vec2[11](vec2(0.116071425,0.20535715),vec2(0.116071425,0.04781106),vec2(0.2093894,0.04781106),vec2(0.250252,0.05267137),vec2(0.27894586,0.0672523),vec2(0.29590294,0.09184188),vec2(0.3015553,0.12672812),vec2(0.29590294,0.16175835),vec2(0.27894586,0.18620391),vec2(0.250252,0.20056884),vec2(0.2093894,0.20535715));
float d = dot(p-v[0],p-v[0]);
float s = 1.0;
for (int i=0, j=10; i<11; j=i, i++) {
  vec2 e = v[j]-v[i];
  vec2 w = p-v[i];
  vec2 b = w - e*clamp(dot(w,e)/dot(e,e),0.0,1.0);
  d = min(d, dot(b,b));
  bvec3 cond = bvec3(p.y>=v[i].y, p.y<v[j].y, e.x*w.y>e.y*w.x);
  if (all(cond) || all(not(cond))) s = -s;
}
return s*sqrt(d);
}

float difference2d_7972bd0cd3(vec2 p) {
return max(polygon2d_8c84162740(p),-polygon2d_d74e13343e(p));
}

float polygon2d_693749ff99(vec2 p) {
vec2 v[11] = vec2[11](vec2(0.116071425,0.38220045),vec2(0.116071425,0.25259218),vec2(0.20218894,0.25259218),vec2(0.23937932,0.25658843),vec2(0.265697,0.2685772),vec2(0.281358,0.2887745),vec2(0.28657833,0.3173963),vec2(0.281358,0.34583813),vec2(0.265697,0.36607143),vec2(0.23937932,0.3781682),vec2(0.20218894,0.38220045));
float d = dot(p-v[0],p-v[0]);
float s = 1.0;
for (int i=0, j=10; i<11; j=i, i++) {
  vec2 e = v[j]-v[i];
  vec2 w = p-v[i];
  vec2 b = w - e*clamp(dot(w,e)/dot(e,e),0.0,1.0);
  d = min(d, dot(b,b));
  bvec3 cond = bvec3(p.y>=v[i].y, p.y<v[j].y, e.x*w.y>e.y*w.x);
  if (all(cond) || all(not(cond))) s = -s;
}
return s*sqrt(d);
}

float difference2d_253ff1c262(vec2 p) {
return max(difference2d_7972bd0cd3(p),-polygon2d_693749ff99(p));
}

float translate2d_445e933069(vec2 p) {
return difference2d_253ff1c262(p-vec2(-0.21039748,-0.21500576));
}

float offset2d_77f4ee6af6(vec2 p) {
return translate2d_445e933069(p)+(-0.01);
}

float extrusion_326460334f(vec3 p) {
float d = offset2d_77f4ee6af6(p.xy);
vec2 w = vec2(d, abs(p.z)-0.22307028);
return min(max(w.x,w.y),0.0)+length(max(w,0.0));
}

float transform_b8f33bcec6(vec3 p) {
return extrusion_326460334f(mat3(vec3(0.6836669,0.0,0.0),vec3(0.0,0.96384764,0.0),vec3(0.0,0.0,1.0))*p+vec3(0.0,0.0,0.0));
}

float offset_028db249e7(vec3 p) {
return transform_b8f33bcec6(p)+(-0.025);
}

float transform_5e859ee106(vec3 p) {
return offset_028db249e7(mat3(vec3(1.0,-0.0,0.0),vec3(0.0,0.00000000000000006123234,1.0),vec3(0.0,-1.0,0.00000000000000006123234))*p+vec3(0.0,-0.0,0.0));
}

float intersection_d4b0dfb801(vec3 p) {
return max(intersection_a27c5fe6b1(p),transform_5e859ee106(p));
}

float transform_2f829f23de(vec3 p) {
return offset_4068fd54ec(mat3(vec3(0.00000000000000006123234,0.0,1.0),vec3(-0.0,1.0,0.0),vec3(-1.0,0.0,0.00000000000000006123234))*p+vec3(-0.0,0.0,0.0));
}

float intersection_577465790e(vec3 p) {
return max(offset_89dccb6616(p),transform_2f829f23de(p));
}

float intersection_720283e4e3(vec3 p) {
return max(intersection_577465790e(p),transform_5e859ee106(p));
}

float translate_d0e303356b(vec3 p) {
return intersection_720283e4e3(p-vec3(0.0,0.74421084,0.0));
}

float opunion_4780217215(vec3 p) {
float d = intersection_d4b0dfb801(p);
d = min(d,translate_d0e303356b(p));
return d;
}

float scale_6be845fac6(vec3 p) {
return opunion_4780217215(p/0.3)*0.3;
}
// ---- visualizer (sphere tracer) ----
float sceneSDF(vec3 p) {
    // center and scale the part to unit size for viewing
    return scale_6be845fac6(p*0.18605271+vec3(0.0,0.11163163,0.0))/0.18605271;
}

vec3 sceneNormal(vec3 p) {
    const float h = 1e-4;
    vec2 k = vec2(1.0,-1.0);
    return normalize( k.xyy*sceneSDF(p+k.xyy*h)
                    + k.yyx*sceneSDF(p+k.yyx*h)
                    + k.yxy*sceneSDF(p+k.yxy*h)
                    + k.xxx*sceneSDF(p+k.xxx*h) );
}

float softShadow(vec3 ro, vec3 rd) {
    float res = 1.0;
    float t = 0.02;
    for (int i=0; i<48; i++) {
        float d = sceneSDF(ro+rd*t);
        res = min(res, 10.0*d/t);
        t += clamp(d, 0.005, 0.2);
        if (res < 0.002 || t > 5.0) break;
    }
    return clamp(res, 0.0, 1.0);
}

void mainImage(out vec4 fragColor, in vec2 fragCoord) {
    vec2 uv = (2.0*fragCoord - iResolution.xy)/iResolution.y;
    float yaw = 0.4*iTime + 6.2831*iMouse.x/iResolution.x;
    float pitch = 0.7 - 2.0*iMouse.y/iResolution.y;
    vec3 ro = 2.2*vec3(cos(yaw)*cos(pitch), sin(yaw)*cos(pitch), sin(pitch));
    vec3 ww = normalize(-ro);
    vec3 uu = normalize(cross(ww, vec3(0.0,0.0,1.0)));
    vec3 vv = cross(uu, ww);
    vec3 rd = normalize(uv.x*uu + uv.y*vv + 1.8*ww);

    float t = 0.0;
    float d = 0.0;
    for (int i=0; i<256; i++) {
        d = sceneSDF(ro + rd*t);
        if (abs(d) < 1e-4 || t > 6.0) break;
        t += d;
    }

    vec3 col = vec3(0.65, 0.78, 0.9) - 0.5*rd.z; // sky
    if (abs(d) < 1e-3) {
        vec3 pos = ro + rd*t;
        vec3 nor = sceneNormal(pos);
        vec3 lig = normalize(vec3(0.6, 0.4, 0.8));
        float dif = clamp(dot(nor, lig), 0.0, 1.0);
        float amb = 0.5 + 0.5*nor.z;
        float sha = softShadow(pos + nor*2e-3, lig);
        col = vec3(0.85, 0.6, 0.3)*(0.2*amb + 0.9*dif*sha);
        col += 0.1*pow(clamp(dot(reflect(rd, nor), lig), 0.0, 1.0), 16.0);
    }
    fragColor = vec4(pow(col, vec3(0.4545)), 1.0);
}
