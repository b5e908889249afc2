float cylinder_873c5e0f8e(vec3 p) {
float dx = length(p.xy)-0.5600753;
float dy = abs(p.z)-0.21214971;
return min(0.0,max(dx,dy))+length(max(vec2(dx,dy),0.0));
}

float polygon2d_b11ba5498d(vec2 p) {
vec2 v[18] = vec2[18](vec2(0.071428575,0.0),vec2(0.071428575,0.42773238),vec2(0.04464286,0.38133815),vec2(0.04177425,0.37815225),vec2(0.03785782,0.37640852),vec2(0.033570755,0.37640852),vec2(0.029654324,0.37815225),vec2(0.026785715,0.38133815),vec2(0.004464286,0.42),vec2(-0.004464286,0.42),vec2(-0.026785715,0.38133815),vec2(-0.029654324,0.37815225),vec2(-0.033570755,0.37640852),vec2(-0.03785782,0.37640852),vec2(-0.04177425,0.37815225),vec2(-0.04464286,0.38133815),vec2(-0.071428575,0.42773238),vec2(-0.071428575,0.0));
float d = dot(p-v[0],p-v[0]);
float s = 1.0;
for (int i=0, j=17; i<18; j=i, i++) {
  vec2 e = v[j]-v[i];
  vec2 w = p-v[i];
  vec2 b = w - e*clamp(dot(w,e)/dot(e,e),0.0,1.0);
  d = min(d, dot(b,b));
  bvec3 cond = bvec3(p.y>=v[i].y, p.y<v[j].y, e.x*w.y>e.y*w.x);
  if (all(cond) || all(not(cond))) s = -s;
}
return s*sqrt(d);
}

float screwnode_b69b6327f5(vec3 p) {
float y = length(p.xy) + p.z*0.03125;
float theta = atan(p.y,p.x);
float z = p.z + -0.071428575*theta/6.283185307179586;
float t = (z+0.035714287)/0.071428575;
float x = 0.071428575*(t-floor(t))-0.035714287;
float d2 = polygon2d_b11ba5498d(vec2(x,y));
return max(d2, abs(p.z)-0.2142712);
}

float difference_cf3c25f56b(vec3 p) {
return max(cylinder_873c5e0f8e(p),-screwnode_b69b6327f5(p));
}

float cylinder_a15d6bcc72(vec3 p) {
float dx = length(p.xy)-1.1811024+0.034448817;
float dy = abs(p.z)-0.10334645;
return min(max(dx,dy),0.0)+length(max(vec2(dx,dy),0.0))-0.034448817;
}

float translate_4ff539e5bf(vec3 p) {
return cylinder_a15d6bcc72(p-vec3(0.0,0.0,-0.35433072));
}

float smoothunion_b232df8f4b(vec3 p) {
float a = difference_cf3c25f56b(p);
float b = translate_4ff539e5bf(p);
float h = clamp(0.5+0.5*(b-a)/0.2,0.0,1.0);
return mix(b,a,h)-0.2*h*(1.0-h);
}

float cylinder_ff1c1b06b8(vec3 p) {
float dx = length(p.xy)-0.375;
float dy = abs(p.z)-0.5511811;
return min(0.0,max(dx,dy))+length(max(vec2(dx,dy),0.0));
}

float difference_cf43e7911c(vec3 p) {
return max(smoothunion_b232df8f4b(p),-cylinder_ff1c1b06b8(p));
}

float scale_6e0a27c40a(vec3 p) {
return difference_cf43e7911c(p/25.4)*25.4;
}
// ---- visualizer (sphere tracer) ----
float sceneSDF(vec3 p) {
    // center and scale the part to unit size for viewing
    return scale_6e0a27c40a(p*30.0+vec3(0.0,0.0,-3.5556986))/30.0;
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
